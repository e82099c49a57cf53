"""Sequence-parallel (long-context) prefill.

Beyond-reference capability: the reference has no sequence/context
parallelism (SURVEY.md §5 "Long-context: absent"); prompts are bounded by
one device's activation memory. Here the prefill tokens are sharded over
the mesh's `seq` axis: every device embeds and runs the full layer stack
on its 1/s slice of the sequence, attention crosses slices via the ring
primitive (ops/ring_attention.py), and the MoE block runs on local tokens
with replicated expert weights — activation memory scales 1/s with the
ring size, so an s-device ring prefills an s-times-longer prompt.

One jitted SPMD program per shape: shard_map over the whole layer stack;
XLA schedules the ring ppermutes to overlap block compute. Decode then
continues on the standard path: `sp_prefill` returns per-layer K/V for the
whole prompt (time-sharded), which `caches_from_sp` scatters into regular
decode KV caches.

Scope: every decoder family — llama-style (Mixtral), MLA (DeepSeek
V2/V3, whose absorbed-latent attention reduces to the SAME ring
primitive: logits q·k = [q_lat | q_pe]·[c | k_pe] and values = c, so
the latent cache itself rides the ring at a fraction of the bytes of
materialized K/V heads), Grok (softcapped attention, post-attn/post-moe
norms), and Arctic (parallel-residual MLP) — plus sp_encode for the
seq2seq families (Switch/NLLB).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from moe_infinity_tpu.models.layers import (
    KVCache,
    apply_rope,
    linear,
    rms_norm,
    rope_cos_sin,
)
from moe_infinity_tpu.ops.moe import grouped_ffn
from moe_infinity_tpu.ops.ring_attention import (
    ring_attention,
    sp_decode_attention,
)
from moe_infinity_tpu.parallel.mesh import SEQ


def sp_prefill(
    model,
    params: Dict[str, Any],
    experts: Dict[str, Any],
    tokens: jax.Array,  # [B, T], T % mesh.shape[seq] == 0
    mesh,
    *,
    for_layer,
    impl: str = "gather",
    seq_axis: str = SEQ,
) -> Tuple[jax.Array, List[KVCache]]:
    """Full-model prefill with the sequence sharded over `seq_axis`.
    Returns (logits [B, T, V] f32, per-layer KVCache with k/v
    [B, T, Hkv, Dh]) — both sharded on the time axis."""
    s = mesh.shape[seq_axis]
    B, T = tokens.shape
    if T % s:
        raise ValueError(f"prompt length {T} not divisible by seq={s}")
    spec = model.spec

    is_mla = hasattr(spec, "kv_lora_rank")

    def _moe_ffn(pl, hn, mli, experts):
        cw, ids = model.route(pl, hn)
        w, slot_map, biases = for_layer(experts, mli)
        Bq, Tl, D = hn.shape
        K = ids.shape[-1]
        y = grouped_ffn(
            hn.reshape(Bq * Tl, D),
            ids.reshape(Bq * Tl, K),
            cw.reshape(Bq * Tl, K).astype(jnp.float32),
            slot_map,
            w,
            "silu",
            biases=biases,
            impl=impl,
        ).reshape(Bq, Tl, D)
        if getattr(spec, "n_shared_experts", 0):
            y = y + model._dense_mlp(
                hn, pl["shared_gate"], pl["shared_up"], pl["shared_down"]
            )
        return y

    def _llama_layer(pl, x, positions):
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        q = linear(h, pl["q"]).reshape(B, -1, spec.num_heads, spec.head_dim)
        k = linear(h, pl["k"]).reshape(B, -1, spec.num_kv_heads, spec.head_dim)
        v = linear(h, pl["v"]).reshape(B, -1, spec.num_kv_heads, spec.head_dim)
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        attn = ring_attention(
            q, k, v, axis_name=seq_axis, axis_size=s, causal=True
        )
        Tl = x.shape[1]
        x = x + linear(attn.reshape(B, Tl, -1), pl["o"])
        return x, k.astype(model.dtype), v.astype(model.dtype)

    def _mla_layer(pl, x, positions):
        """Absorbed-MLA attention over the latent ring (mirrors
        models/deepseek_v2.py attn_block, unfolded path): the ring carries
        [c | k_pe] as keys and c as values."""
        from moe_infinity_tpu.models.deepseek_v2 import rope_interleaved

        Tl = x.shape[1]
        H = spec.num_heads
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        if spec.q_lora_rank is None:
            q = linear(h, pl["q"])
        else:
            q = linear(
                rms_norm(linear(h, pl["q_a"]), pl["q_a_norm"], spec.rms_eps),
                pl["q_b"],
            )
        q = q.reshape(B, Tl, H, spec.qk_head_dim)
        q_nope = q[..., : spec.qk_nope_head_dim]
        q_pe = q[..., spec.qk_nope_head_dim :]
        ckv = linear(h, pl["kv_a"])
        c = rms_norm(ckv[..., : spec.kv_lora_rank], pl["kv_a_norm"], spec.rms_eps)
        k_pe = ckv[..., spec.kv_lora_rank :][:, :, None, :]
        cos, sin = model._rope_tables(positions)
        q_pe = rope_interleaved(q_pe, cos, sin)
        k_pe = rope_interleaved(k_pe, cos, sin)
        q_lat = jnp.einsum(
            "bthd,hdr->bthr", q_nope.astype(jnp.float32),
            pl["w_uk"].astype(jnp.float32),
        )
        scale = spec.qk_head_dim ** -0.5
        q_ring = jnp.concatenate(
            [q_lat, q_pe.astype(jnp.float32)], axis=-1
        )
        k_ring = jnp.concatenate(
            [c.astype(jnp.float32), k_pe[:, :, 0, :].astype(jnp.float32)],
            axis=-1,
        )[:, :, None, :]
        v_ring = c.astype(jnp.float32)[:, :, None, :]
        out_lat = ring_attention(
            q_ring, k_ring, v_ring,
            axis_name=seq_axis, axis_size=s, causal=True, scale=scale,
        )  # [B, Tl, H, R]
        out = jnp.einsum(
            "bthr,hdr->bthd", out_lat, pl["w_uv"].astype(jnp.float32)
        )
        out = linear(
            out.reshape(B, Tl, H * spec.v_head_dim).astype(model.dtype),
            pl["o"],
        )
        # decode caches hold (c, k_pe) — the latent IS the cache
        return x + out, c[:, :, None, :].astype(model.dtype), k_pe.astype(
            model.dtype
        )

    arch = getattr(model, "arch", None)

    def _qkv_ring(pl, h, positions, *, theta, scale=None, softcap=None):
        """Shared q/k/v projection + rope + ring for llama-layout blocks."""
        Tl = h.shape[1]
        q = linear(h, pl["q"]).reshape(B, Tl, spec.num_heads, spec.head_dim)
        k = linear(h, pl["k"]).reshape(
            B, Tl, spec.num_kv_heads, spec.head_dim
        )
        v = linear(h, pl["v"]).reshape(
            B, Tl, spec.num_kv_heads, spec.head_dim
        )
        cos, sin = rope_cos_sin(positions, spec.head_dim, theta)
        q, k = apply_rope(q, k, cos, sin)
        attn = ring_attention(
            q, k, v, axis_name=seq_axis, axis_size=s, causal=True,
            scale=scale, logit_softcap=softcap,
        )
        return attn.reshape(B, Tl, -1), k.astype(model.dtype), v.astype(
            model.dtype
        )

    def _router(pl, hn, normalize):
        from moe_infinity_tpu.ops.moe import topk_router

        Bq, Tl, _ = hn.shape
        logits = linear(hn.astype(jnp.float32), pl["router"])
        cw, ids, _ = topk_router(
            logits.reshape(Bq * Tl, -1), spec.top_k, normalize=normalize
        )
        return cw.reshape(Bq, Tl, -1), ids.reshape(Bq, Tl, -1)

    def _grok_layer(pl, x, positions, experts, li):
        """Mirrors GrokModel.pre_moe/apply_moe (softcapped attention,
        post-attn and post-moe norms, unnormalized top-k gelu experts)."""
        h = rms_norm(x, pl["pre_attn"], spec.rms_eps)
        a, k, v = _qkv_ring(
            pl, h, positions, theta=10000.0,
            scale=spec.attn_output_multiplier, softcap=spec.max_attn_value,
        )
        x = x + rms_norm(linear(a, pl["o"]), pl["post_attn"], spec.rms_eps)
        hn = rms_norm(x, pl["pre_moe"], spec.rms_eps)
        cw, ids = _router(pl, hn, normalize=False)
        y = _grouped(pl, hn, cw, ids, experts, model.moe_layer_index(li),
                     "gelu")
        x = x + rms_norm(y, pl["post_moe"], spec.rms_eps)
        return x, k, v

    def _arctic_layer(pl, x, positions, experts, li):
        """Mirrors ArcticModel pre_moe/apply_moe incl. the
        parallel-residual MLP (MoE input taken pre-attention)."""
        x_pre = x
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        a, k, v = _qkv_ring(pl, h, positions, theta=spec.rope_theta)
        x = x + linear(a, pl["o"])
        mli = model.moe_layer_index(li)
        if mli is None:
            hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
            x = x + model._silu_mlp(
                hn, pl["mlp_w1"], pl["mlp_w2"], pl["mlp_w3"]
            )
            return x, k, v
        if spec.parallel_attn_mlp_res:
            hr = rms_norm(x, pl["res_norm"], spec.rms_eps)
            x = x + model._silu_mlp(
                hr, pl["res_w1"], pl["res_w2"], pl["res_w3"]
            )
            hn = rms_norm(x_pre, pl["post_norm"], spec.rms_eps)
        else:
            hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
        cw, ids = _router(pl, hn, normalize=(spec.top_k > 1))
        x = x + _grouped(pl, hn, cw, ids, experts, mli, "silu")
        return x, k, v

    def _grouped(pl, hn, cw, ids, experts, mli, act):
        w, slot_map, biases = for_layer(experts, mli)
        Bq, Tl, D = hn.shape
        K = ids.shape[-1]
        return grouped_ffn(
            hn.reshape(Bq * Tl, D),
            ids.reshape(Bq * Tl, K),
            cw.reshape(Bq * Tl, K).astype(jnp.float32),
            slot_map, w, act, biases=biases, impl=impl,
        ).reshape(Bq, Tl, D)

    def local_fn(params, experts, tokens_loc):
        idx = jax.lax.axis_index(seq_axis)
        Tl = tokens_loc.shape[1]
        positions = jnp.broadcast_to(
            idx * Tl + jnp.arange(Tl, dtype=jnp.int32), (B, Tl)
        )
        x = model.embed(params, tokens_loc)
        ks, vs = [], []
        for li in range(spec.num_layers):
            pl = params["layers"][li]
            if arch == "grok":
                x, k, v = _grok_layer(pl, x, positions, experts, li)
            elif arch == "arctic":
                x, k, v = _arctic_layer(pl, x, positions, experts, li)
            else:
                layer = _mla_layer if is_mla else _llama_layer
                x, k, v = layer(pl, x, positions)
                hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
                mli = model.moe_layer_index(li)
                if mli is None:  # DeepSeek first_k_dense_replace layers
                    x = x + model._dense_mlp(
                        hn, pl["mlp_gate"], pl["mlp_up"], pl["mlp_down"]
                    )
                else:
                    x = x + _moe_ffn(pl, hn, mli, experts)
            ks.append(k)
            vs.append(v)
        logits = model.head(params, x)
        return logits, jnp.stack(ks), jnp.stack(vs)

    rep = P()
    t_spec = P(None, seq_axis)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, t_spec),
        out_specs=(
            P(None, seq_axis, None),
            P(None, None, seq_axis, None, None),
            P(None, None, seq_axis, None, None),
        ),
        check_vma=False,
    )
    logits, ks, vs = jax.jit(fn)(params, experts, tokens)
    kvs = [KVCache(ks[li], vs[li]) for li in range(spec.num_layers)]
    return logits, kvs


def sp_encode(
    model,
    params: Dict[str, Any],
    experts: Dict[str, Any],
    tokens: jax.Array,  # [B, T] unpadded, T % mesh.shape[seq] == 0
    mesh,
    *,
    for_layer,
    impl: str = "gather",
    seq_axis: str = SEQ,
) -> jax.Array:
    """Sequence-parallel ENCODER pass for the seq2seq families (long-
    document support the reference lacks — it truncates at one device's
    activation memory): bidirectional ring attention over the `seq` axis,
    MoE on local tokens. Switch's T5 relative bias rides the ring via the
    bias_fn hook, and its capacity-masked top-1 router stays EXACT across
    shards by prefix-summing per-expert token counts over the seq axis
    (each shard's capacity budget = capacity − tokens earlier shards
    already routed to that expert). Assumes unpadded input. Returns the
    encoder output [B, T, D] sharded on T."""
    s = mesh.shape[seq_axis]
    B, T = tokens.shape
    if T % s:
        raise ValueError(f"prompt length {T} not divisible by seq={s}")
    spec = model.spec
    is_switch = hasattr(spec, "d_kv")

    def _capacity_route(b, h):
        """switch_route with a cross-shard prefix-summed capacity budget."""
        E = spec.num_experts
        logits = linear(h.astype(jnp.float32), b["router"])
        probs = jax.nn.softmax(logits, axis=-1)
        idx = jnp.argmax(probs, axis=-1)  # [B, Tl]
        onehot = jax.nn.one_hot(idx, E, dtype=jnp.int32)
        local_cum = jnp.cumsum(onehot, axis=1)  # [B, Tl, E]
        counts = jax.lax.all_gather(onehot.sum(axis=1), seq_axis)  # [s,B,E]
        me = jax.lax.axis_index(seq_axis)
        earlier = jnp.arange(s)[:, None, None] < me
        prefix = jnp.where(earlier, counts, 0).sum(axis=0)  # [B, E]
        priority = prefix[:, None, :] + local_cum
        keep = (priority <= spec.expert_capacity).astype(jnp.float32)
        keep = jnp.take_along_axis(keep, idx[..., None], axis=-1)[..., 0]
        maxp = jnp.max(probs, axis=-1)
        return (maxp * keep)[..., None], idx[..., None].astype(jnp.int32)

    def local_fn(params, experts, tokens_loc):
        idx = jax.lax.axis_index(seq_axis)
        Tl = tokens_loc.shape[1]
        gpos = idx * Tl + jnp.arange(Tl, dtype=jnp.int32)  # [Tl] global

        if is_switch:
            table = params["enc_blocks"][0]["rel_bias"]

            def bias_fn(qp, kp):
                from moe_infinity_tpu.models.layers import t5_position_bias

                return t5_position_bias(
                    table, qp, kp, True,
                    spec.rel_buckets, spec.rel_max_distance,
                )

            x = params["embed"][tokens_loc].astype(model.dtype)
            for i, b in enumerate(params["enc_blocks"]):
                h = rms_norm(x, b["ln0"], spec.rms_eps)
                H, Dk = spec.num_heads, spec.d_kv
                q = linear(h, b["q"]).reshape(B, Tl, H, Dk)
                k = linear(h, b["k"]).reshape(B, Tl, H, Dk)
                v = linear(h, b["v"]).reshape(B, Tl, H, Dk)
                attn = ring_attention(
                    q, k, v, axis_name=seq_axis, axis_size=s,
                    causal=False, scale=1.0, bias_fn=bias_fn,
                )
                x = x + linear(attn.reshape(B, Tl, H * Dk), b["o"])
                h = rms_norm(x, b["ln_ff"], spec.rms_eps)
                if spec.is_sparse(i, False):
                    cw, ids = _capacity_route(b, h)
                    w, slot_map, biases = for_layer(
                        experts, spec.moe_layer_id(i, False)
                    )
                    y = model.apply_ff(
                        jnp.zeros_like(h), h, cw, ids, w, slot_map, biases,
                        impl,
                    )
                else:
                    y = model._dense_ff(b, h)
                x = x + y
            return rms_norm(x, params["enc_final_ln"], spec.rms_eps)

        # NLLB / M2M100: biased pre-LN attention, sinusoidal positions
        # (unpadded: position id = global index + 1 + pad_token_id)
        from moe_infinity_tpu.models.layers import layer_norm

        pos_ids = gpos + 1 + spec.pad_token_id
        x = (
            params["embed"][tokens_loc].astype(model.dtype) * model._scale
            + model._pos_table[pos_ids].astype(model.dtype)
        )
        H = spec.num_heads
        Dh = spec.d_model // H
        for i, b in enumerate(params["enc_blocks"]):
            a = b["self_attn"]
            h = layer_norm(x, b["ln0_w"], b["ln0_b"], 1e-5)
            q = linear(h, a["q"], a["qb"]).reshape(B, Tl, H, Dh)
            k = linear(h, a["k"], a["kb"]).reshape(B, Tl, H, Dh)
            v = linear(h, a["v"], a["vb"]).reshape(B, Tl, H, Dh)
            attn = ring_attention(
                q, k, v, axis_name=seq_axis, axis_size=s,
                causal=False, scale=Dh ** -0.5,
            )
            x = x + linear(attn.reshape(B, Tl, -1), a["o"], a["ob"])
            h = layer_norm(x, b["lnf_w"], b["lnf_b"], 1e-5)
            mli = (
                spec.moe_layer_id(i, False)
                if spec.is_sparse(i, False)
                else None
            )
            x = x + model._ff(b, h, mli, experts, for_layer, impl)
        return layer_norm(
            x, params["enc_final_ln_w"], params["enc_final_ln_b"], 1e-5
        )

    rep = P()
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, P(None, seq_axis)),
        out_specs=P(None, seq_axis, None),
        check_vma=False,
    )
    return jax.jit(fn)(params, experts, tokens)


def caches_from_sp(
    sp_kvs: List[KVCache], max_len: int, mesh=None
) -> List[KVCache]:
    """Scatter sequence-parallel prefill K/V ([B, T, ...]) into standard
    decode caches ([B, max_len, ...], zero-padded) so generation continues
    on the regular decode path with kv_len = T."""
    out = []
    for c in sp_kvs:
        B, T = c.k.shape[0], c.k.shape[1]
        if T > max_len:
            raise ValueError(f"prefill length {T} exceeds cache {max_len}")
        pad = [(0, 0), (0, max_len - T), (0, 0), (0, 0)]
        k = jnp.pad(c.k, pad)
        v = jnp.pad(c.v, pad)
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            k, v = jax.device_put(k, rep), jax.device_put(v, rep)
        out.append(KVCache(k, v))
    return out

class SPDecoder:
    """Long-context DECODE over sequence-sharded caches (beyond-reference;
    complements `sp_prefill`, which covers the prompt).

    `caches_from_sp` gathers the prompt's K/V onto every device — fine for
    prompts that fit one chip, but it forfeits the 1/s memory scaling that
    made the SP prefill possible. SPDecoder keeps the prefill K/V where it
    landed: frozen, time-sharded over the `seq` axis. Generated tokens go
    to a small REPLICATED tail (decode lengths are tiny next to the
    long-context prompts this serves). Each decode step is one SPMD
    program: every device computes the flash-decoding partial over its own
    shard, the partials merge with two O(B·H·Dv) collectives
    (ops/ring_attention.py `sp_decode_attention`), the tail folds in
    replicated, and the MoE FFN runs replicated on the single token. No
    K/V bytes cross the ICI at decode time.

    Families: llama-style (Mixtral), MLA (DeepSeek V2/V3 — the latent
    shard serves as both key and value, same as the prefill ring), Grok
    (softcap + post-norms), Arctic (parallel residual)."""

    def __init__(
        self,
        model,
        params: Dict[str, Any],
        experts: Dict[str, Any],
        mesh,
        *,
        for_layer,
        impl: str = "gather",
        tail_cap: int = 64,
        seq_axis: str = SEQ,
    ):
        self.model = model
        self.params = params
        self.experts = experts
        self.mesh = mesh
        self.for_layer = for_layer
        self.impl = impl
        self.tail_cap = int(tail_cap)
        self.seq_axis = seq_axis
        self.s = mesh.shape[seq_axis]
        self.is_mla = hasattr(model.spec, "kv_lora_rank")
        self.arch = getattr(model, "arch", None)
        self._step_fn = None
        self._state = None  # (ks, vs, tks, tvs) after prefill

    # ---- layer bodies (mirror the sp_prefill variants) -------------------
    def _attn(self, pl, h, pos_arr, k_shard, v_shard, tk, tv, g, *,
              theta, scale=None, softcap=None):
        model, spec = self.model, self.model.spec
        B = h.shape[0]
        q = linear(h, pl["q"]).reshape(B, 1, spec.num_heads, spec.head_dim)
        k = linear(h, pl["k"]).reshape(B, 1, spec.num_kv_heads, spec.head_dim)
        v = linear(h, pl["v"]).reshape(B, 1, spec.num_kv_heads, spec.head_dim)
        cos, sin = rope_cos_sin(pos_arr, spec.head_dim, theta)
        q, k = apply_rope(q, k, cos, sin)
        tk = jax.lax.dynamic_update_slice(tk, k.astype(tk.dtype), (0, g, 0, 0))
        tv = jax.lax.dynamic_update_slice(tv, v.astype(tv.dtype), (0, g, 0, 0))
        attn = sp_decode_attention(
            q, k_shard, v_shard, tk, tv, g + 1,
            axis_name=self.seq_axis, scale=scale, logit_softcap=softcap,
        )
        return attn.reshape(B, 1, -1), tk, tv

    def _moe_y(self, pl, hn, mli):
        model, spec = self.model, self.model.spec
        cw, ids = model.route(pl, hn)
        w, slot_map, biases = self.for_layer(self.experts, mli)
        Bq, Tl, D = hn.shape
        K = ids.shape[-1]
        act = "gelu" if self.arch == "grok" else "silu"
        y = grouped_ffn(
            hn.reshape(Bq * Tl, D), ids.reshape(Bq * Tl, K),
            cw.reshape(Bq * Tl, K).astype(jnp.float32),
            slot_map, w, act, biases=biases, impl=self.impl,
        ).reshape(Bq, Tl, D)
        if getattr(spec, "n_shared_experts", 0):
            y = y + model._dense_mlp(
                hn, pl["shared_gate"], pl["shared_up"], pl["shared_down"]
            )
        return y

    def _llama_decode(self, pl, x, pos_arr, mli, ksh, vsh, tk, tv, g):
        model, spec = self.model, self.model.spec
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        a, tk, tv = self._attn(
            pl, h, pos_arr, ksh, vsh, tk, tv, g, theta=spec.rope_theta
        )
        x = x + linear(a, pl["o"])
        hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
        if mli is None:  # DeepSeek first_k_dense_replace layers
            x = x + model._dense_mlp(
                hn, pl["mlp_gate"], pl["mlp_up"], pl["mlp_down"]
            )
        else:
            x = x + self._moe_y(pl, hn, mli)
        return x, tk, tv

    def _mla_decode(self, pl, x, pos_arr, mli, c_shard, kpe_shard, tc,
                    tkpe, g):
        from moe_infinity_tpu.models.deepseek_v2 import rope_interleaved

        model, spec = self.model, self.model.spec
        B, H = x.shape[0], spec.num_heads
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        if spec.q_lora_rank is None:
            q = linear(h, pl["q"])
        else:
            q = linear(
                rms_norm(linear(h, pl["q_a"]), pl["q_a_norm"], spec.rms_eps),
                pl["q_b"],
            )
        q = q.reshape(B, 1, H, spec.qk_head_dim)
        q_nope = q[..., : spec.qk_nope_head_dim]
        q_pe = q[..., spec.qk_nope_head_dim :]
        ckv = linear(h, pl["kv_a"])
        c = rms_norm(
            ckv[..., : spec.kv_lora_rank], pl["kv_a_norm"], spec.rms_eps
        )
        k_pe = ckv[..., spec.kv_lora_rank :][:, :, None, :]
        cos, sin = model._rope_tables(pos_arr)
        q_pe = rope_interleaved(q_pe, cos, sin)
        k_pe = rope_interleaved(k_pe, cos, sin)
        tc = jax.lax.dynamic_update_slice(
            tc, c[:, :, None, :].astype(tc.dtype), (0, g, 0, 0)
        )
        tkpe = jax.lax.dynamic_update_slice(
            tkpe, k_pe.astype(tkpe.dtype), (0, g, 0, 0)
        )
        q_lat = jnp.einsum(
            "bthd,hdr->bthr", q_nope.astype(jnp.float32),
            pl["w_uk"].astype(jnp.float32),
        )
        q_ring = jnp.concatenate([q_lat, q_pe.astype(jnp.float32)], axis=-1)
        out_lat = sp_decode_attention(
            q_ring,
            jnp.concatenate(
                [c_shard.astype(jnp.float32), kpe_shard.astype(jnp.float32)],
                axis=-1,
            ),
            c_shard.astype(jnp.float32),
            jnp.concatenate(
                [tc.astype(jnp.float32), tkpe.astype(jnp.float32)], axis=-1
            ),
            tc.astype(jnp.float32),
            g + 1,
            axis_name=self.seq_axis,
            scale=spec.qk_head_dim ** -0.5,
        )  # [B, 1, H, R]
        out = jnp.einsum(
            "bthr,hdr->bthd", out_lat.astype(jnp.float32),
            pl["w_uv"].astype(jnp.float32),
        )
        x = x + linear(
            out.reshape(B, 1, H * spec.v_head_dim).astype(model.dtype),
            pl["o"],
        )
        hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
        if mli is None:
            x = x + model._dense_mlp(
                hn, pl["mlp_gate"], pl["mlp_up"], pl["mlp_down"]
            )
        else:
            x = x + self._moe_y(pl, hn, mli)
        return x, tc, tkpe

    def _grok_decode(self, pl, x, pos_arr, mli, ksh, vsh, tk, tv, g):
        from moe_infinity_tpu.ops.moe import topk_router

        model, spec = self.model, self.model.spec
        h = rms_norm(x, pl["pre_attn"], spec.rms_eps)
        a, tk, tv = self._attn(
            pl, h, pos_arr, ksh, vsh, tk, tv, g, theta=10000.0,
            scale=spec.attn_output_multiplier, softcap=spec.max_attn_value,
        )
        x = x + rms_norm(linear(a, pl["o"]), pl["post_attn"], spec.rms_eps)
        hn = rms_norm(x, pl["pre_moe"], spec.rms_eps)
        B = hn.shape[0]
        logits = linear(hn.astype(jnp.float32), pl["router"])
        cw, ids, _ = topk_router(
            logits.reshape(B, -1), spec.top_k, normalize=False
        )
        w, slot_map, biases = self.for_layer(self.experts, mli)
        y = grouped_ffn(
            hn.reshape(B, -1), ids, cw.astype(jnp.float32), slot_map, w,
            "gelu", biases=biases, impl=self.impl,
        ).reshape(B, 1, -1)
        x = x + rms_norm(y, pl["post_moe"], spec.rms_eps)
        return x, tk, tv

    def _arctic_decode(self, pl, x, pos_arr, mli, ksh, vsh, tk, tv, g):
        from moe_infinity_tpu.ops.moe import topk_router

        model, spec = self.model, self.model.spec
        x_pre = x
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        a, tk, tv = self._attn(
            pl, h, pos_arr, ksh, vsh, tk, tv, g, theta=spec.rope_theta
        )
        x = x + linear(a, pl["o"])
        if mli is None:
            hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
            x = x + model._silu_mlp(
                hn, pl["mlp_w1"], pl["mlp_w2"], pl["mlp_w3"]
            )
            return x, tk, tv
        if spec.parallel_attn_mlp_res:
            hr = rms_norm(x, pl["res_norm"], spec.rms_eps)
            x = x + model._silu_mlp(
                hr, pl["res_w1"], pl["res_w2"], pl["res_w3"]
            )
            hn = rms_norm(x_pre, pl["post_norm"], spec.rms_eps)
        else:
            hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
        B = hn.shape[0]
        logits = linear(hn.astype(jnp.float32), pl["router"])
        cw, ids, _ = topk_router(
            logits.reshape(B, -1), spec.top_k, normalize=(spec.top_k > 1)
        )
        w, slot_map, biases = self.for_layer(self.experts, mli)
        y = grouped_ffn(
            hn.reshape(B, -1), ids, cw.astype(jnp.float32), slot_map, w,
            "silu", biases=biases, impl=self.impl,
        ).reshape(B, 1, -1)
        return x + y, tk, tv

    # ---- step program ----------------------------------------------------
    def _layer_fn(self):
        if self.arch == "grok":
            return self._grok_decode
        if self.arch == "arctic":
            return self._arctic_decode
        return self._mla_decode if self.is_mla else self._llama_decode

    def _build_step(self):
        model, spec = self.model, self.model.spec
        layer = self._layer_fn()

        def local_step(params, experts_, tok, pos, ks, vs, tks, tvs, g):
            B = tok.shape[0]
            pos_arr = jnp.broadcast_to(pos.astype(jnp.int32), (B, 1))
            x = model.embed(params, tok)
            new_tks, new_tvs = [], []
            for li in range(spec.num_layers):
                pl = params["layers"][li]
                mli = model.moe_layer_index(li)
                x, tk, tv = layer(
                    pl, x, pos_arr, mli, ks[li], vs[li], tks[li], tvs[li], g
                )
                new_tks.append(tk)
                new_tvs.append(tv)
            return (
                model.head(params, x),
                jnp.stack(new_tks),
                jnp.stack(new_tvs),
            )

        rep = P()
        shard5 = P(None, None, self.seq_axis, None, None)
        fn = jax.shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(rep, rep, rep, rep, shard5, shard5, rep, rep, rep),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )
        # NOTE: self.experts flows in replicated; arena-style providers
        # would shard it on an expert axis instead (future work)
        self._step_fn = jax.jit(fn)

    # ---- public API --------------------------------------------------------
    def prefill(self, tokens: jax.Array) -> int:
        """Sequence-parallel prefill; keeps the K/V shards in place.
        Returns the first generated (greedy) token id."""
        model, spec = self.model, self.model.spec
        logits, kvs = sp_prefill(
            model, self.params, self.experts, tokens, self.mesh,
            for_layer=self.for_layer, impl=self.impl,
            seq_axis=self.seq_axis,
        )
        shard5 = NamedSharding(
            self.mesh, P(None, None, self.seq_axis, None, None)
        )
        ks = jax.device_put(jnp.stack([c.k for c in kvs]), shard5)
        vs = jax.device_put(jnp.stack([c.v for c in kvs]), shard5)
        B = tokens.shape[0]
        rep = NamedSharding(self.mesh, P())
        C = self.tail_cap
        tks = jax.device_put(
            jnp.zeros((spec.num_layers, B, C) + ks.shape[3:], ks.dtype), rep
        )
        tvs = jax.device_put(
            jnp.zeros((spec.num_layers, B, C) + vs.shape[3:], vs.dtype), rep
        )
        self._state = [ks, vs, tks, tvs]
        self._T = tokens.shape[1]
        import numpy as _np

        return int(_np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))[0])

    def step(self, token: int, g: int) -> jax.Array:
        """One decode step: feed `token` (the g-th generated token,
        0-based) at global position T+g. Returns logits [B, 1, V]."""
        if self._state is None:
            raise RuntimeError("call prefill() first")
        if g >= self.tail_cap:
            raise ValueError(
                f"decode tail exhausted ({self.tail_cap}); raise tail_cap"
            )
        if self._step_fn is None:
            self._build_step()
        ks, vs, tks, tvs = self._state
        B = ks.shape[1]
        logits, tks, tvs = self._step_fn(
            self.params, self.experts,
            jnp.full((B, 1), token, jnp.int32),
            jnp.int32(self._T + g), ks, vs, tks, tvs, jnp.int32(g),
        )
        self._state[2], self._state[3] = tks, tvs
        return logits

    def generate(self, input_ids, max_new_tokens: int = 32,
                 eos_token_id=None):
        """Greedy long-context generation, batch 1: SP prefill + SP decode.
        Ragged prompts are handled exactly: the ring prefills the largest
        ring-divisible prefix and the remaining (< ring size) prompt
        tokens ride the decode path into the replicated tail. Returns the
        full sequence (prompt + generated) as a numpy array."""
        import numpy as _np

        arr = _np.atleast_2d(_np.asarray(input_ids))
        if arr.shape[0] != 1:
            raise ValueError("SPDecoder.generate supports batch size 1")
        T = arr.shape[1]
        r = T % self.s
        if T - r == 0:
            raise ValueError(
                f"prompt length {T} is shorter than the ring size {self.s}"
            )
        if r + max_new_tokens > self.tail_cap:
            raise ValueError(
                f"prompt remainder ({r}) + max_new_tokens "
                f"({max_new_tokens}) > tail_cap {self.tail_cap}"
            )
        tok = self.prefill(jnp.asarray(arr[:, : T - r], jnp.int32))
        g = 0
        for i in range(r):  # remainder prompt tokens -> the tail
            logits = self.step(int(arr[0, T - r + i]), g)
            g += 1
            if i == r - 1:  # only the last remainder's logits are used —
                # skipping the intermediate host argmaxes lets the r tail
                # steps dispatch back-to-back without device->host syncs
                tok = int(_np.asarray(jnp.argmax(logits[0, -1, :])))
        generated = [tok]
        from moe_infinity_tpu.runtime.generate import eos_hit

        while len(generated) < max_new_tokens and not (
            eos_token_id is not None and eos_hit(tok, eos_token_id)
        ):
            logits = self.step(tok, g)
            g += 1
            tok = int(_np.asarray(jnp.argmax(logits[0, -1, :])))
            generated.append(tok)
        return _np.concatenate([arr[0], _np.asarray(generated, _np.int64)])
