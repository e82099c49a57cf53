"""TP x EP pod serving: model-axis column sharding of arena experts.

With a `model` mesh axis of size tp > 1, each expert-coordinate's arena
splits into tp column buffers (store/column.py ColumnShardStore slices
each record's d_ff dim), the jointly-sharded weights view adds a `model`
dim, and grouped_ffn_ep psums over (expert, model) — every routed
expert's GEMMs split across the model columns. The reference replicates
whole experts per GPU instead
(/root/reference/moe_infinity/distributed/expert_executor.py:49-54).

Outputs must match HF greedy exactly — including NLLB's fc1/fc2 biases
(fc2.bias is replicated across columns and must be added exactly once).
"""

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.parallel import MeshPlan, make_mesh
from moe_infinity_tpu.parallel.pod import PodOffloadExecutor
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.pod_engine import PodOffloadEngine
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.column import ColumnShardStore, column_views
from moe_infinity_tpu.store.ingest import ingest_checkpoint

L, E = 2, 4


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=E,
        num_experts_per_tok=2, vocab_size=128, max_position_embeddings=64,
        torch_dtype=torch.float32, architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(7)
    hf = MixtralForCausalLM(cfg).eval()
    ckpt = tmp_path_factory.mktemp("podtp") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("podtp") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32",
        dense_dtype="float32",
    )
    return cfg, hf, store_dir


def test_column_store_slices_reassemble(tiny):
    _, _, store_dir = tiny
    store = ExpertStore(store_dir)
    views = column_views(store, 2)
    full = store.get_expert(0, 1)
    a = views[0].get_expert(0, 1)
    b = views[1].get_expert(0, 1)
    # gate/up slice d_ff columns (record [D, F]); down slices rows
    np.testing.assert_array_equal(
        np.concatenate([a["w1.weight"], b["w1.weight"]], axis=1),
        full["w1.weight"],
    )
    np.testing.assert_array_equal(
        np.concatenate([a["w2.weight"], b["w2.weight"]], axis=0),
        full["w2.weight"],
    )
    np.testing.assert_array_equal(
        np.concatenate([a["w3.weight"], b["w3.weight"]], axis=1),
        full["w3.weight"],
    )
    # sliced view advertises sliced shapes
    assert views[0]._field_by_name["w1.weight"].shape == (32, 32)
    assert views[0]._field_by_name["w2.weight"].shape == (32, 32)


def test_column_store_shares_base_read(tiny):
    _, _, store_dir = tiny

    class CountingStore:
        def __init__(self, inner):
            self._inner = inner
            self.reads = 0

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def get_expert(self, layer, expert, **kw):
            self.reads += 1
            return self._inner.get_expert(layer, expert, **kw)

    base = CountingStore(ExpertStore(store_dir))
    views = column_views(base, 2)
    views[0].get_expert(1, 2)
    views[1].get_expert(1, 2)
    assert base.reads == 1  # one base read shared by both columns
    views[0].get_expert(1, 2)  # fresh cycle re-reads
    assert base.reads == 2


def _pod_tp_engine(cfg, store_dir, *, dp=1, tp=2, ep=2, s_local=2,
                   speculative=False, store_wrap=None, **ex_kw):
    mesh = make_mesh(MeshPlan(data=dp, model=tp, expert=ep))
    store = ExpertStore(store_dir)
    if store_wrap is not None:
        store = store_wrap(store)
    model = MixtralModel(
        MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32, mesh=mesh
    )
    params = model.load_params(DenseArchive(store_dir))
    ex = PodOffloadExecutor(
        mesh, store, s_local, compute_dtype=jnp.float32, num_threads=1,
        **ex_kw,
    )
    eng = PodOffloadEngine(
        model, params, ex, prefetch=False, impl="ragged",
        speculative=speculative,
    )
    return eng, ex, mesh


def _hf_greedy(hf, prompt, n):
    with torch.no_grad():
        return hf.generate(
            torch.tensor(prompt), max_new_tokens=n, do_sample=False
        ).numpy()


def test_pod_tp_ep_exact(tiny):
    """model=2 x expert=2: column-sharded arena slots, greedy == HF."""
    cfg, hf, store_dir = tiny
    eng, ex, _ = _pod_tp_engine(cfg, store_dir, tp=2, ep=2)
    try:
        assert ex.tp == 2
        # each coordinate's arena carries one mirror column on the
        # column-1 device
        for c, arena in ex.arenas.items():
            assert len(arena._mirrors) == 1
            assert arena._mirrors[0][0] != arena.device
        prompt = np.array([[3, 17, 9, 42]])
        want = _hf_greedy(hf, prompt, 6)
        gen = Generator(stepper=eng, max_seq_len=32)
        got = gen.generate(prompt, max_new_tokens=6).sequences
        np.testing.assert_array_equal(got[:, :want.shape[1]], want)
        st = ex.stats()
        assert st["visits"] > 0
    finally:
        ex.shutdown()


def test_pod_dp_tp_ep_exact(tiny):
    """data=2 x model=2 x expert=2 (8 devices): the full composition."""
    cfg, hf, store_dir = tiny
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    eng, ex, _ = _pod_tp_engine(cfg, store_dir, dp=2, tp=2, ep=2)
    try:
        prompt = np.array([[3, 17, 9, 42], [8, 77, 5, 31]])
        want = _hf_greedy(hf, prompt, 5)
        gen = Generator(stepper=eng, max_seq_len=32)
        got = gen.generate(prompt, max_new_tokens=5).sequences
        np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    finally:
        ex.shutdown()


def test_pod_dp_speculative_exact(tiny):
    """Speculative whole-step decode under data > 1 (round-5 item):
    per-row slot tables in the snapshot ([L, dp, E]), union residency
    semantics (a key is resident only when every row holds it), one
    barrier per dispatch. Greedy == HF for both batch rows."""
    cfg, hf, store_dir = tiny
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    eng, ex, _ = _pod_tp_engine(
        cfg, store_dir, dp=2, tp=2, ep=2, s_local=E, speculative=True
    )
    try:
        prompt = np.array([[3, 17, 9, 42], [8, 77, 5, 31]])
        want = _hf_greedy(hf, prompt, 6)
        gen = Generator(stepper=eng, max_seq_len=32)
        got = gen.generate(prompt, max_new_tokens=6).sequences
        np.testing.assert_array_equal(got[:, :want.shape[1]], want)
        assert eng.replay_counts  # the speculative path actually ran
    finally:
        ex.shutdown()


def test_pod_tp_speculative_exact(tiny):
    """Speculative whole-step decode over TP-column snapshots."""
    cfg, hf, store_dir = tiny
    eng, ex, _ = _pod_tp_engine(
        cfg, store_dir, tp=2, ep=2, s_local=E, speculative=True
    )
    try:
        prompt = np.array([[5, 31, 8, 77]])
        want = _hf_greedy(hf, prompt, 6)
        gen = Generator(stepper=eng, max_seq_len=32)
        got = gen.generate(prompt, max_new_tokens=6).sequences
        np.testing.assert_array_equal(got[:, :want.shape[1]], want)
        assert eng.replay_counts  # the speculative path actually ran
    finally:
        ex.shutdown()


@pytest.fixture(scope="module")
def tiny_quant(tiny, tmp_path_factory):
    """int8 + int4 stores of the same tiny checkpoint."""
    cfg, hf, _ = tiny
    ckpt = tmp_path_factory.mktemp("podtpq") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    stores = {}
    for dt in ("int8", "int4"):
        sd = str(tmp_path_factory.mktemp("podtpq") / f"store_{dt}")
        ingest_checkpoint(
            str(ckpt), sd, cfg, expert_dtype=dt, dense_dtype="float32"
        )
        stores[dt] = sd
    return stores


def test_column_store_int4_repack_roundtrip(tiny_quant):
    """A packed-int4 gate column slice must carry exactly that column's
    channels: split-wise packing interleaves channel i with i + F/2, so
    the view unpacks/slices/repacks — verify against the full record."""
    from moe_infinity_tpu.store.quant import unpack_int4_np

    store = ExpertStore(tiny_quant["int4"])
    views = column_views(store, 2)
    full = unpack_int4_np(store.get_expert(0, 1)["w1.weight"])  # [D, F]
    a = unpack_int4_np(views[0].get_expert(0, 1)["w1.weight"])
    b = unpack_int4_np(views[1].get_expert(0, 1)["w1.weight"])
    np.testing.assert_array_equal(np.concatenate([a, b], axis=1), full)
    # scales slice with the channels; down's scale replicates
    sa = views[0].get_expert(0, 1)["w1.weight.scale"]
    sfull = store.get_expert(0, 1)["w1.weight.scale"]
    np.testing.assert_array_equal(sa, sfull[: sfull.shape[0] // 2])
    np.testing.assert_array_equal(
        views[1].get_expert(0, 1)["w2.weight.scale"],
        store.get_expert(0, 1)["w2.weight.scale"],
    )


def test_column_store_block_scales_rejected(tiny):
    _, _, store_dir = tiny
    store = ExpertStore(store_dir)

    class FakeField:
        name = "w1.weight.scale"
        shape = (4, 4)
        dtype = "float32"

    class FakeBlockStore:
        def __getattr__(self, name):
            return getattr(store, name)

        @property
        def fields(self):
            return list(store.fields) + [FakeField()]

        @property
        def field_names(self):
            return store.field_names + ["w1.weight.scale"]

    with pytest.raises(NotImplementedError, match="BLOCK"):
        ColumnShardStore(FakeBlockStore(), 0, 2)


@pytest.mark.parametrize("dt", ["int8", "int4"])
def test_pod_tp_quantized_matches_pure_ep(tiny_quant, tiny, dt):
    """TP=2 column-sharded dispatch over a quantized store decodes the
    same greedy tokens as the pure-EP pod path on the same store (the
    established quantized oracle — fp32 HF differs by quantization)."""
    cfg, _, _ = tiny
    store_dir = tiny_quant[dt]
    prompt = np.array([[3, 17, 9, 42]])
    seqs = {}
    for tp in (1, 2):
        eng, ex, _ = _pod_tp_engine(
            cfg, store_dir, tp=tp, ep=2, s_local=E
        )
        try:
            gen = Generator(stepper=eng, max_seq_len=32)
            seqs[tp] = gen.generate(prompt, max_new_tokens=6).sequences
        finally:
            ex.shutdown()
    np.testing.assert_array_equal(seqs[2], seqs[1])


def test_pod_tp_host_fallback_exact(tiny):
    """Run-on-host escape hatch under TP columns: a deadline-missed
    expert's slot row stays -1, so EVERY column's partial contributes
    zero for it, and the full host-computed delta is added exactly once
    — greedy output stays HF-exact and the counter proves it fired."""
    import time as _t

    cfg, hf, store_dir = tiny

    class SlowStore:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def get_expert(self, layer, expert, **kw):
            _t.sleep(0.08)  # > host_fallback_timeout for every fetch
            return self._inner.get_expert(layer, expert, **kw)

    eng, ex, _ = _pod_tp_engine(
        cfg, store_dir, tp=2, ep=2, store_wrap=SlowStore,
        host_fallback=True, host_fallback_timeout=0.02,
    )
    try:
        prompt = np.array([[5, 31, 8, 77]])
        want = _hf_greedy(hf, prompt, 4)
        gen = Generator(stepper=eng, max_seq_len=32)
        got = gen.generate(prompt, max_new_tokens=4).sequences
        np.testing.assert_array_equal(got[:, :want.shape[1]], want)
        assert ex.host_exec_count > 0  # the escape hatch actually fired
    finally:
        ex.shutdown()


@pytest.mark.slow  # >=9 s: fast-suite budget (VERDICT r4 item 8)
def test_pod_tp_seq2seq_nllb_facade(tmp_path):
    """NLLB (fc1/fc2 BIASES) under multihost model=2 x expert=2 through
    the facade: fc2.bias is replicated across TP columns and must be
    added exactly once by the (expert, model) psum program."""
    from transformers import NllbMoeConfig, NllbMoeForConditionalGeneration

    from moe_infinity_tpu.entrypoints.api import MoE
    from moe_infinity_tpu.runtime.pod_engine import PodSeq2SeqOffloadEngine

    cfg = NllbMoeConfig(
        vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, encoder_sparse_step=2,
        decoder_sparse_step=2, num_experts=4, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        moe_token_dropout=0.0, router_jitter_noise=0.0, pad_token_id=1,
        bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
        torch_dtype=torch.float32,
        architectures=["NllbMoeForConditionalGeneration"],
    )
    torch.manual_seed(29)
    hf = NllbMoeForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)

    moe = MoE(str(ckpt), {
        "offload_path": str(tmp_path / "store"),
        "expert_dtype": "float32", "multihost": True,
        "expert_parallel": 2, "tensor_parallel": 2, "num_slots": 2,
        "max_seq_len": 64, "prefetch": False,
    })
    try:
        assert isinstance(moe.engine, PodSeq2SeqOffloadEngine)
        assert moe.engine.executor.tp == 2
        prompt = np.array([[5, 31, 8, 77, 2]])
        want = _hf_greedy(hf, prompt, 6)
        got = moe.generate(prompt, max_new_tokens=6)
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
    finally:
        moe.shutdown()
