"""MoE facade + OpenAI server tests (tiny Mixtral checkpoint, CPU)."""

import json
import threading
import urllib.request

import numpy as np
import pytest
import torch
from transformers import (
    MixtralConfig,
    MixtralForCausalLM,
    PreTrainedTokenizerFast,
)

from moe_infinity_tpu.entrypoints.api import MoE

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=128,
        max_position_embeddings=128,
        torch_dtype=torch.float32,
        architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(1)
    hf = MixtralForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("api") / "ckpt"
    hf.save_pretrained(path, safe_serialization=True)

    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {f"tok{i}": i for i in range(124)}
    vocab.update({"<eos>": 124, "<unk>": 125, "hello": 126, "world": 127})
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    t = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="<eos>", unk_token="<unk>"
    )
    t.save_pretrained(path)
    return str(path), hf


def test_moe_resident_generate_matches_hf(tiny_ckpt):
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64},
    )
    prompt = np.array([[5, 9, 33]])
    got = engine.generate(prompt, max_new_tokens=6)
    want = hf.generate(
        torch.tensor(prompt), max_new_tokens=6, do_sample=False, pad_token_id=0
    ).numpy()
    np.testing.assert_array_equal(got, want)
    assert engine.hit_rate() == 1.0  # resident plan


def test_moe_generate_stops_at_config_eos(tiny_ckpt, tmp_path):
    """HF semantics: generate() defaults eos_token_id from the model
    config (reference delegates to HF generate which reads it from the
    generation config), so sequences stop early at EOS without the caller
    passing eos_token_id. Bias the LM head so EOS is always the greedy
    pick: generation must stop after exactly one new token."""
    path, hf = tiny_ckpt
    import copy

    biased = copy.deepcopy(hf)
    eos = biased.config.eos_token_id
    with torch.no_grad():
        biased.lm_head.weight[eos] += 100.0
    ckpt = tmp_path / "eos_ckpt"
    biased.save_pretrained(ckpt, safe_serialization=True)
    engine = MoE(str(ckpt), {"expert_dtype": "float32", "max_seq_len": 64})
    prompt = np.array([[5, 9, 33]])
    got = engine.generate(prompt, max_new_tokens=8)
    want = biased.generate(
        torch.tensor(prompt), max_new_tokens=8, do_sample=False,
        pad_token_id=0,
    ).numpy()
    assert want.shape[1] == prompt.shape[1] + 1  # HF stopped at EOS
    np.testing.assert_array_equal(got, want)


def test_moe_offload_plan_matches(tiny_ckpt):
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {
            "expert_dtype": "float32",
            "max_seq_len": 64,
            # tiny budget forces the offload plan; slots >= one layer
            "device_memory_bytes": 1,
            "num_slots": 4,
        },
    )
    assert engine.engine is not None  # offload engine active
    prompt = np.array([[5, 9, 33]])
    got = engine.generate(prompt, max_new_tokens=6)
    want = hf.generate(
        torch.tensor(prompt), max_new_tokens=6, do_sample=False, pad_token_id=0
    ).numpy()
    np.testing.assert_array_equal(got, want)
    assert engine.stats()["visits"] > 0
    engine.shutdown()


@pytest.fixture(scope="module")
def server(tiny_ckpt):
    from transformers import AutoTokenizer

    from moe_infinity_tpu.entrypoints.openai.server import build_server

    path, _ = tiny_ckpt
    engine = MoE(path, {"expert_dtype": "float32", "max_seq_len": 64})
    tokenizer = AutoTokenizer.from_pretrained(path)
    srv = build_server(engine, tokenizer, "tiny-mixtral", "127.0.0.1", 0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health_and_models(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
        models = json.loads(r.read())
    assert models["data"][0]["id"] == "tiny-mixtral"


def test_completions_endpoint(server):
    resp = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 4, "temperature": 0.0},
    )
    assert resp["object"] == "text_completion"
    assert len(resp["choices"]) == 1
    assert resp["usage"]["prompt_tokens"] == 2
    assert resp["usage"]["completion_tokens"] > 0


def test_continuous_serving_through_facade(tiny_ckpt):
    """max_batch_size > 1 activates the continuous batcher; concurrent
    generate() calls batch on-device and match serial outputs."""
    import concurrent.futures as cf

    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64, "max_batch_size": 2,
         "kv_page_size": 8},
    )
    assert engine.batcher is not None
    prompts = [np.array([[5, 9, 33]]), np.array([[7, 21, 4, 90]])]
    wants = [
        hf.generate(
            torch.tensor(p), max_new_tokens=5, do_sample=False, pad_token_id=0
        ).numpy()
        for p in prompts
    ]
    with cf.ThreadPoolExecutor(2) as ex:
        gots = list(
            ex.map(lambda p: engine.generate(p, max_new_tokens=5), prompts)
        )
    for got, want in zip(gots, wants):
        np.testing.assert_array_equal(got, want)
    engine.shutdown()


def test_metrics_endpoint(server):
    # logit_bias suppresses <eos> (id 124) so at least one token is
    # counted even when this runs first in its module (greedy "hello"
    # continuation EOSes immediately on the seed-1 tiny model; without
    # the bias the tokens_generated assert is satisfied only by counter
    # accumulation from earlier tests — order-dependent)
    _post(
        server + "/v1/completions",
        {"prompt": "hello", "max_tokens": 2, "temperature": 0.0,
         "logit_bias": {"124": -100}},
    )
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1
    assert m["tokens_generated"] >= 1


def test_chat_streaming_tokens(tiny_ckpt):
    """Token-level SSE streaming through the continuous batcher."""
    import threading
    import urllib.request as ur

    from transformers import AutoTokenizer

    from moe_infinity_tpu.entrypoints.openai.server import build_server

    path, _ = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64, "max_batch_size": 2,
         "kv_page_size": 8},
    )
    assert engine.batcher is not None
    tokenizer = AutoTokenizer.from_pretrained(path)
    srv = build_server(engine, tokenizer, "tiny", "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = ur.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            json.dumps(
                {
                    "messages": [{"role": "user", "content": "hello world"}],
                    "max_tokens": 4,
                    "temperature": 0.0,
                    "stream": True,
                }
            ).encode(),
            {"Content-Type": "application/json"},
        )
        with ur.urlopen(req, timeout=120) as r:
            body = r.read().decode()
        chunks = [
            json.loads(line[6:])
            for line in body.splitlines()
            if line.startswith("data: ") and line != "data: [DONE]"
        ]
        deltas = [
            c["choices"][0]["delta"].get("content")
            for c in chunks
            if c["choices"][0]["delta"].get("content")
        ]
        # reference: what the engine generates for the same chat prompt
        prompt = "user: hello world\nassistant:"
        ids = tokenizer(prompt, return_tensors="np").input_ids
        ref = engine.generate(
            ids, max_new_tokens=4, eos_token_id=tokenizer.eos_token_id
        )[0, ids.shape[1] :]
        ref = [int(t) for t in ref if t != tokenizer.eos_token_id]
        assert deltas == [tokenizer.decode([t]) for t in ref]
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
        assert "data: [DONE]" in body
    finally:
        srv.shutdown()
        engine.shutdown()


def test_chat_completions_endpoint(server):
    resp = _post(
        server + "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 4,
            "temperature": 0.0,
        },
    )
    assert resp["object"] == "chat.completion"
    assert resp["choices"][0]["message"]["role"] == "assistant"


def test_completions_sampling_params(server):
    """Full sampling surface accepted; fixed seed => deterministic."""
    payload = {
        "prompt": "hello world",
        "max_tokens": 6,
        "temperature": 0.8,
        "top_p": 0.9,
        "top_k": 20,
        "presence_penalty": 0.3,
        "frequency_penalty": 0.2,
        "repetition_penalty": 1.1,
        "seed": 7,
    }
    a = _post(server + "/v1/completions", payload)
    b = _post(server + "/v1/completions", payload)
    assert a["choices"][0]["text"] == b["choices"][0]["text"]


def test_completions_logprobs(server):
    resp = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 4, "temperature": 0.0,
         "logprobs": 3},
    )
    lp = resp["choices"][0]["logprobs"]
    assert lp is not None
    n = len(lp["tokens"])
    assert n > 0
    assert len(lp["token_logprobs"]) == n
    assert len(lp["top_logprobs"]) == n
    assert all(len(t) == 3 for t in lp["top_logprobs"])
    assert lp["text_offset"][0] == 0
    # greedy: the chosen token's logprob equals the max of its top dict
    for tok_lp, tops in zip(lp["token_logprobs"], lp["top_logprobs"]):
        assert abs(tok_lp - max(tops.values())) < 1e-4


def test_completions_stop_string(server):
    # first learn what greedy emits, then stop on its first token's text
    free = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 6, "temperature": 0.0},
    )["choices"][0]["text"]
    first_word = free.split()[0]
    resp = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 6, "temperature": 0.0,
         "stop": [first_word]},
    )
    choice = resp["choices"][0]
    assert first_word not in choice["text"]
    assert choice["finish_reason"] == "stop"


def test_completions_n_choices(server):
    resp = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 4, "temperature": 0.9,
         "n": 3, "seed": 2},
    )
    assert len(resp["choices"]) == 3
    assert [c["index"] for c in resp["choices"]] == [0, 1, 2]
    assert resp["usage"]["completion_tokens"] >= 3


def test_completions_best_of(server):
    """best_of > n: server samples best_of candidates and returns the
    top-n by mean logprob."""
    resp = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 4, "temperature": 1.2,
         "n": 1, "best_of": 4, "seed": 3},
    )
    assert len(resp["choices"]) == 1
    # deterministic given the seed
    resp2 = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 4, "temperature": 1.2,
         "n": 1, "best_of": 4, "seed": 3},
    )
    assert resp["choices"][0]["text"] == resp2["choices"][0]["text"]


def test_completions_logit_bias(server):
    """OpenAI logit_bias: +100 forces a token on every step (serial
    engine path)."""
    resp = _post(
        server + "/v1/completions",
        {"prompt": "hello world", "max_tokens": 3, "temperature": 0.0,
         "logit_bias": {"126": 100.0}},
    )
    text = resp["choices"][0]["text"]
    # token 126 decodes to "hello"; forced every step
    assert text.split() == ["hello"] * 3


def test_logit_bias_through_batcher(tiny_ckpt):
    """Per-row logit_bias inside the continuous batcher: a biased and an
    unbiased request share the batch; only the biased row is affected."""
    path, hf = tiny_ckpt
    import concurrent.futures as cf

    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64, "max_batch_size": 2,
         "kv_page_size": 8},
    )
    assert engine.batcher is not None
    try:
        plain_want = hf.generate(
            torch.tensor([[5, 9, 33]]), max_new_tokens=4, do_sample=False,
            pad_token_id=0,
        ).numpy()
        with cf.ThreadPoolExecutor(2) as ex:
            f_bias = ex.submit(
                engine.generate, np.array([[7, 21, 4]]), max_new_tokens=4,
                logit_bias={100: 100.0},
            )
            f_plain = ex.submit(
                engine.generate, np.array([[5, 9, 33]]), max_new_tokens=4,
            )
            biased, plain = f_bias.result(), f_plain.result()
        assert (biased[0, 3:] == 100).all()  # forced token every step
        n = plain.shape[1]
        np.testing.assert_array_equal(plain, plain_want[:, :n])
    finally:
        engine.shutdown()


def test_moe_facade_speculative_decode(tiny_ckpt):
    """speculative_decode=True through the facade's offload plan matches
    HF greedy exactly."""
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64,
         "device_memory_bytes": 1, "num_slots": 8,
         "dense_paging": "off",  # force ONLY expert offload: these tests
         # exercise speculative decode, which needs dense resident
         "speculative_decode": True, "prefetch": False,
         "max_batch_size": 1},  # pin the engine path (no pooled batcher)
    )
    try:
        assert engine.engine is not None and engine.engine.speculative
        prompt = np.array([[5, 9, 33]])
        got = engine.generate(prompt, max_new_tokens=6)
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0,
        ).numpy()
        np.testing.assert_array_equal(got, want)
        assert engine.engine.replay_counts
    finally:
        engine.shutdown()


def test_moe_facade_speculative_block(tiny_ckpt):
    """speculative_block=3 through the facade: k greedy tokens per
    compiled speculative program, HF-greedy exact (arena big enough to
    hold a block's expert union: all 8 (layer, expert) pairs)."""
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64,
         "device_memory_bytes": 1, "num_slots": 8,
         "dense_paging": "off",  # force ONLY expert offload: these tests
         # exercise speculative decode, which needs dense resident
         "speculative_decode": True, "speculative_block": 3,
         "prefetch": False, "max_batch_size": 1},
    )
    try:
        assert engine.engine.spec_block == 3
        prompt = np.array([[5, 9, 33]])
        got = engine.generate(prompt, max_new_tokens=7, eos_token_id=None)
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=7, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        ).numpy()
        np.testing.assert_array_equal(got, want)
        assert engine.engine.replay_counts
    finally:
        engine.shutdown()


def test_moe_facade_offload_pooled_batcher(tiny_ckpt):
    """speculative_decode + max_batch_size > 1 through the offload plan:
    the facade wires the continuous batcher to the engine's arena; pooled
    speculative steps match HF greedy exactly for concurrent requests."""
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64,
         "device_memory_bytes": 1, "num_slots": 8,
         "dense_paging": "off",  # force ONLY expert offload: these tests
         # exercise speculative decode, which needs dense resident
         "speculative_decode": True, "prefetch": False,
         "max_batch_size": 2},
    )
    try:
        assert engine.engine is not None and engine.batcher is not None
        assert engine.batcher.arena is engine.engine.arena
        p1 = np.array([[5, 9, 33]])
        p2 = np.array([[7, 2]])
        want1 = hf.generate(
            torch.tensor(p1), max_new_tokens=5, do_sample=False,
            pad_token_id=0,
        ).numpy()
        want2 = hf.generate(
            torch.tensor(p2), max_new_tokens=4, do_sample=False,
            pad_token_id=0,
        ).numpy()
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(2) as ex:
            g1 = ex.submit(engine.generate, p1, max_new_tokens=5)
            g2 = ex.submit(engine.generate, p2, max_new_tokens=4)
            np.testing.assert_array_equal(g1.result(), want1)
            np.testing.assert_array_equal(g2.result(), want2)
        assert engine.batcher.replay_counts
    finally:
        engine.shutdown()


def test_generate_stops_on_any_of_multiple_eos(tiny_ckpt, tmp_path):
    """List-valued eos_token_id (multi-terminator checkpoints): generation
    stops when ANY member appears, matching HF."""
    path, hf = tiny_ckpt
    import copy

    biased = copy.deepcopy(hf)
    with torch.no_grad():
        biased.lm_head.weight[100] += 100.0  # token 100 always wins greedy
    ckpt = tmp_path / "meos_ckpt"
    biased.save_pretrained(ckpt, safe_serialization=True)
    engine = MoE(str(ckpt), {"expert_dtype": "float32", "max_seq_len": 64})
    prompt = np.array([[5, 9, 33]])
    out = engine.generate(
        prompt, max_new_tokens=8, eos_token_id=[99, 100]
    )
    assert out.shape[1] == prompt.shape[1] + 1  # stopped at first token
    assert out[0, -1] == 100

def test_moe_facade_multichip_resident(tiny_ckpt):
    """tensor_parallel/expert_parallel config axes through the facade:
    params TP-sharded, experts EP-sharded on the virtual 8-device mesh,
    output identical to HF greedy (GSPMD inserts the collectives)."""
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64,
         "tensor_parallel": 2, "expert_parallel": 4,
         "max_batch_size": 1},
    )
    try:
        assert engine.mesh is not None
        assert dict(engine.mesh.shape)["expert"] == 4
        prompt = np.array([[5, 9, 33]])
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0,
        ).numpy()
        got = engine.generate(prompt, max_new_tokens=6)
        np.testing.assert_array_equal(got, want)
    finally:
        engine.shutdown()

def test_moe_facade_data_parallel(tiny_ckpt):
    """data_parallel config through the facade: batch rows sharded over
    the `data` mesh axis (composed with EP here: dp=2 x ep=4 on the
    virtual 8-device mesh), output identical to HF greedy. A batch not
    divisible by the data axis stays replicated and still matches."""
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64,
         "data_parallel": 2, "expert_parallel": 4,
         "max_batch_size": 1},
    )
    try:
        assert dict(engine.mesh.shape)["data"] == 2
        prompt = np.array([[5, 9, 33], [7, 21, 4]])  # B=2: dp-sharded
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        ).numpy()
        got = engine.generate(prompt, max_new_tokens=6, eos_token_id=None)
        np.testing.assert_array_equal(got, want)
        odd = np.array([[5, 9, 33]])  # B=1: indivisible -> replicated
        want_o = hf.generate(
            torch.tensor(odd), max_new_tokens=4, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        ).numpy()
        got_o = engine.generate(odd, max_new_tokens=4, eos_token_id=None)
        np.testing.assert_array_equal(got_o, want_o)
    finally:
        engine.shutdown()


def test_moe_facade_sequence_parallel(tiny_ckpt):
    """sequence_parallel config: greedy batch-1 long prompts ride the SP
    lane (ring prefill + SP decode over frozen shards), matching HF
    exactly; short prompts fall through to the standard path."""
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64,
         "sequence_parallel": 4, "max_batch_size": 1},
    )
    try:
        assert engine.sp_decoder is not None
        prompt = np.array([[5, 9, 33, 7, 41, 2, 88, 13, 4]])  # 9 tokens, ragged
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        ).numpy()
        got = engine.generate(prompt, max_new_tokens=6, eos_token_id=None)
        np.testing.assert_array_equal(got, want)
        # short prompt: standard lane, still exact
        short = np.array([[5, 9]])
        want_s = hf.generate(
            torch.tensor(short), max_new_tokens=4, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        ).numpy()
        got_s = engine.generate(short, max_new_tokens=4, eos_token_id=None)
        np.testing.assert_array_equal(got_s, want_s)
    finally:
        engine.shutdown()
