"""Decode-megakernel parity: the single-pallas_call decode (interpret mode on
CPU = identical kernel code) against the step-scan int8 path it replaces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_tts_tpu.config import DecoderConfig, MambaConfig
from mamba_tts_tpu.infer.quant_decode import (
    quant_step_with_kv,
    quantize_decoder_params,
)
from mamba_tts_tpu.models.decoder import MambaTTSDecoder
from mamba_tts_tpu.models.mamba import init_mamba_state
from mamba_tts_tpu.ops.decode_megakernel import megakernel_greedy_decode


def _tiny(num_quantizers=2):
    return DecoderConfig(
        codebook_size=16,
        d_model=64,
        n_layers=2,
        n_heads=4,
        d_ff=128,
        d_style=32,
        max_len=256,
        num_quantizers=num_quantizers,
        mamba=MambaConfig(d_model=64, d_state=4),
        dtype="bfloat16",
        scan_chunk=8,
        use_pallas=False,
    )


def _setup(cfg, seed=0):
    dec = MambaTTSDecoder(cfg)
    T_text, T_ref = 7, 11
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    audio = jax.random.randint(ks[0], (1, cfg.num_quantizers, 4), 2, cfg.vocab_size_audio)
    th = jax.random.normal(ks[1], (1, T_text, cfg.d_model), jnp.bfloat16)
    z = jax.random.normal(ks[2], (1, cfg.d_style), jnp.bfloat16)
    rh = jax.random.normal(ks[3], (1, T_ref, cfg.d_model), jnp.bfloat16)
    tm = jnp.arange(T_text)[None] < T_text - 2  # ragged mask
    rm = jnp.ones((1, T_ref), bool)
    variables = dec.init(ks[4], audio, th, z, tm, rh, rm)
    qparams = quantize_decoder_params(variables["params"], cfg)
    return dec, variables, qparams, th, z, tm, rh, rm


def _step_scan_logits(dec, variables, qparams, th, z, tm, rh, rm, forced, F):
    """Reference: per-step quant_step_with_kv with forced input tokens."""
    c = dec.cfg
    KV, memory_mask, films = dec.apply(
        variables, th, tm, rh, rm, z, method=MambaTTSDecoder.project_memories
    )
    cc = c.with_mamba_dims()
    states = [init_mamba_state(cc.mamba, 1, dtype=jnp.bfloat16)
              for _ in range(c.n_layers)]
    out = []
    for t in range(forced.shape[0]):
        logits, states = quant_step_with_kv(
            qparams, c, forced[t][None, None], KV, memory_mask, films,
            states, jnp.asarray(t), F,
        )
        out.append(logits[0, 0])
    return jnp.stack(out)  # (total, V)


def test_teacher_forced_logits_match_step_scan():
    cfg = _tiny()
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg)
    F = 4
    total = cfg.num_quantizers * F
    key = jax.random.PRNGKey(42)
    forced = jnp.concatenate([
        jnp.array([cfg.bos_id], jnp.int32),
        jax.random.randint(key, (total - 1,), 2, cfg.vocab_size_audio),
    ])

    res = megakernel_greedy_decode(
        dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
        ref_mask=rm, collect_logits=True, forced_tokens=forced,
        weight_dtype="int8",
    )
    got = np.asarray(res.logits[0], np.float32)  # (total, V)

    ref = np.asarray(
        _step_scan_logits(dec, variables, qparams, th, z, tm, rh, rm, forced, F),
        np.float32,
    )
    # identical int8 weights; differences are bf16 op-order only.  Compare on
    # the real token columns (specials are -1e9-masked in the kernel).
    sp = cfg.num_special_tokens
    g, r = got[:, sp:], ref[:, sp:]
    denom = np.abs(r).max()
    assert np.abs(g - r).max() / denom < 3e-2, np.abs(g - r).max() / denom
    # argmax agreement under teacher forcing (no divergence cascade)
    agree = (g.argmax(1) == r.argmax(1)).mean()
    assert agree >= 0.9, agree

    # bf16 weight mode (scales pre-folded): adds only per-weight bf16
    # rounding on top of the int8 path — stays inside a slightly wider band
    res_bf = megakernel_greedy_decode(
        dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
        ref_mask=rm, collect_logits=True, forced_tokens=forced,
        weight_dtype="bfloat16",
    )
    g_bf = np.asarray(res_bf.logits[0], np.float32)[:, sp:]
    assert np.abs(g_bf - r).max() / denom < 5e-2


def test_greedy_stream_contract():
    cfg = _tiny(num_quantizers=3)
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg, seed=3)
    F = 4
    res = megakernel_greedy_decode(
        dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
        ref_mask=rm, collect_logits=True,
    )
    total = cfg.num_quantizers * F
    assert res.tokens.shape == (1, total)
    toks = np.asarray(res.tokens[0])
    assert (toks >= cfg.num_special_tokens).all() and (toks < cfg.vocab_size_audio).all()
    assert np.isfinite(np.asarray(res.logits[0, :, cfg.num_special_tokens:])).all()

    # the first step has no feedback: it must match the step-scan argmax
    forced0 = jnp.array([cfg.bos_id], jnp.int32)
    ref0 = _step_scan_logits(dec, variables, qparams, th, z, tm, rh, rm, forced0, F)
    assert int(np.asarray(ref0)[0, cfg.num_special_tokens:].argmax()) + cfg.num_special_tokens == int(toks[0])


def test_unrolled_grid_matches_single_step():
    """U tokens per grid step is a pure re-blocking: logits identical to U=1
    (same op order per token), including across the auto-reduction when U
    does not divide the total."""
    cfg = _tiny()
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg, seed=7)
    F = 4  # total = 8 -> U=3 auto-reduces to 2
    outs = {}
    for U in (1, 3):
        r = megakernel_greedy_decode(
            dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
            ref_mask=rm, collect_logits=True, unroll_steps=U,
        )
        outs[U] = (np.asarray(r.tokens), np.asarray(r.logits, np.float32))
    assert (outs[1][0] == outs[3][0]).all()
    assert np.abs(outs[1][1] - outs[3][1]).max() == 0.0


def test_sampled_decode():
    """Gumbel-max sampling: near-zero temperature reproduces greedy; the
    same key reproduces; different keys diverge; tokens stay in range."""
    cfg = _tiny()
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg, seed=2)
    F = 4

    def run(temperature, seed=None):
        return np.asarray(megakernel_greedy_decode(
            dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
            ref_mask=rm, temperature=temperature,
            rng=None if seed is None else jax.random.PRNGKey(seed),
        ).tokens)

    greedy = run(0.0)
    near_greedy = run(1e-4, seed=0)
    assert (near_greedy == greedy).all()
    s1, s1b, s2 = run(2.0, seed=1), run(2.0, seed=1), run(2.0, seed=7)
    assert (s1 == s1b).all()
    assert (s1 != s2).any()
    assert (s1 >= cfg.num_special_tokens).all()
    assert (s1 < cfg.vocab_size_audio).all()
    with pytest.raises(ValueError):
        run(1.0)  # temperature > 0 without an rng key


def test_int8_kv_mode_close_to_bf16():
    """kv_dtype="int8" (per-channel K/V with scales folded into q / the
    output row) stays within per-channel-quantization error of the bf16-KV
    kernel."""
    cfg = _tiny()
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg, seed=5)
    F = 4
    total = cfg.num_quantizers * F
    forced = jnp.concatenate([
        jnp.array([cfg.bos_id], jnp.int32),
        jax.random.randint(jax.random.PRNGKey(9), (total - 1,), 2,
                           cfg.vocab_size_audio),
    ])
    outs = {}
    for kvd in ("bfloat16", "int8"):
        r = megakernel_greedy_decode(
            dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
            ref_mask=rm, collect_logits=True, forced_tokens=forced,
            kv_dtype=kvd,
        )
        outs[kvd] = np.asarray(r.logits[0], np.float32)
    sp = cfg.num_special_tokens
    a, b = outs["bfloat16"][:, sp:], outs["int8"][:, sp:]
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 5e-2, rel
    assert (a.argmax(1) == b.argmax(1)).mean() >= 0.9


def test_batched_matches_per_sequence_runs():
    """B=2 decode == two independent B=1 decodes of the same inputs (batch
    rows only share weights; attention/SSM state updates are per-sequence)."""
    cfg = _tiny()
    F = 4
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg, seed=0)
    outs = []
    for shift in (0.0, 0.3):  # vary the conditioning per row, same weights
        res = megakernel_greedy_decode(
            dec, variables, qparams, th + shift, z, F, text_mask=tm,
            ref_hidden=rh, ref_mask=rm, collect_logits=True,
        )
        outs.append(res)

    th2 = jnp.concatenate([th, th + 0.3], axis=0)
    z2 = jnp.concatenate([z, z], axis=0)
    tm2 = jnp.concatenate([tm, tm], axis=0)
    rh2 = jnp.concatenate([rh, rh], axis=0)
    rm2 = jnp.concatenate([rm, rm], axis=0)
    res2 = megakernel_greedy_decode(
        dec, variables, qparams, th2, z2, F, text_mask=tm2, ref_hidden=rh2,
        ref_mask=rm2, collect_logits=True,
    )
    assert res2.tokens.shape == (2, cfg.num_quantizers * F)
    sp = cfg.num_special_tokens
    for row in (0, 1):
        assert (np.asarray(res2.tokens[row])
                == np.asarray(outs[row].tokens[0])).all()
        # logits agree to shape-dependent-dispatch noise: the kernel itself
        # is row-independent (verified bit-exact under row perturbation);
        # the residual comes from XLA computing the B=2 memory projections
        # with different blocking than B=1.  Compare real token columns.
        got = np.asarray(res2.logits[row], np.float32)[:, sp:]
        want = np.asarray(outs[row].logits[0], np.float32)[:, sp:]
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-2


def test_plan_resident_bytes_matches_real_plan():
    """The VMEM fit planner's shape arithmetic is pinned against the ACTUAL
    plan arrays _build_plan constructs: const-operand bytes must match
    sum(nbytes) exactly for every dtype rung, so planner drift from kernel
    changes fails here instead of mis-sizing serving batches."""
    from mamba_tts_tpu.ops.decode_megakernel import (
        _build_plan,
        _round_up,
        plan_resident_bytes,
    )

    cfg = _tiny()
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg)
    KV, memory_mask, films = dec.apply(
        variables, th, tm, rh, rm, z, method=MambaTTSDecoder.project_memories
    )
    F = 4
    memory_len = rh.shape[1] + th.shape[1]
    c = cfg.with_mamba_dims()
    m = c.mamba
    B, U = 1, 1
    Vpad = _round_up(c.vocab_size_audio, 128)
    streamed = 2 * (U * 1 * c.d_model * 2 + U * B * Vpad * 4)
    scratch = (B * Vpad * 2
               + c.n_layers * (m.d_conv - 1) * B * m.d_inner * 2
               + c.n_layers * B * m.d_state * m.d_inner * 4)
    for wd, kvd in (("bfloat16", "bfloat16"), ("int8", "bfloat16"),
                    ("int8", "int8")):
        plan = _build_plan(c, qparams, KV, memory_mask, films, F,
                           weight_dtype=wd, kv_dtype=kvd)
        const_bytes = sum(
            np.asarray(a).nbytes for name, a in plan._asdict().items()
            if name != "emb_pq"  # streamed per step, not resident whole
        )
        got = plan_resident_bytes(c, B, memory_len, wd, kvd)
        assert got == const_bytes + streamed + scratch, (
            wd, kvd, got, const_bytes + streamed + scratch)


def test_megakernel_fit_monotone():
    """Fit degrades monotonically: growing batch or memory never yields a
    FASTER dtype rung, and past the largest rung the planner returns None."""
    from __graft_entry__ import _flagship_cfg
    from mamba_tts_tpu.ops.decode_megakernel import (
        _DTYPE_LADDER,
        megakernel_fit,
        megakernel_max_batch,
    )

    cfg = _flagship_cfg().with_mamba_dims()
    rank = {pair: i for i, pair in enumerate(_DTYPE_LADDER)}
    for M in (114, 370, 1250, 2610):
        prev = -1
        for B in range(1, 33):
            fit = megakernel_fit(cfg, B, M)
            r = rank[fit] if fit is not None else len(_DTYPE_LADDER)
            assert r >= prev, (M, B, fit)
            prev = r
        mb = megakernel_max_batch(cfg, M)
        assert megakernel_fit(cfg, mb + 1, M) is None or mb == 64
        if mb:
            assert megakernel_fit(cfg, mb, M) is not None


def test_precomputed_weight_plan_matches_inline():
    """A session-precomputed weight plan (the serving posture: plans are
    runtime jit args, see infer.synthesize) is bit-identical to the inline
    qparams rebuild, for both residency dtypes."""
    from mamba_tts_tpu.ops.decode_megakernel import build_weight_plan

    cfg = _tiny()
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg, seed=5)
    F = 4
    for wd, kvd in (("bfloat16", "bfloat16"), ("int8", "int8")):
        wp = jax.jit(lambda q, wd=wd: build_weight_plan(cfg, q, wd))(qparams)
        res_inline = megakernel_greedy_decode(
            dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
            ref_mask=rm, collect_logits=True, weight_dtype=wd, kv_dtype=kvd,
        )
        res_wp = megakernel_greedy_decode(
            dec, variables, qparams, th, z, F, text_mask=tm, ref_hidden=rh,
            ref_mask=rm, collect_logits=True, weight_dtype=wd, kv_dtype=kvd,
            weight_plan=wp,
        )
        np.testing.assert_array_equal(
            np.asarray(res_inline.tokens), np.asarray(res_wp.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(res_inline.logits, dtype=np.float32),
            np.asarray(res_wp.logits, dtype=np.float32),
        )


def test_weight_plan_dtype_mismatch_rejected():
    """_build_plan refuses a precomputed plan whose residency dtype differs
    from the requested weight_dtype (a mismatch would silently bypass the
    VMEM fit planner's choice)."""
    from mamba_tts_tpu.ops.decode_megakernel import build_weight_plan

    cfg = _tiny()
    dec, variables, qparams, th, z, tm, rh, rm = _setup(cfg, seed=7)
    wp_bf16 = build_weight_plan(cfg, qparams, "bfloat16")
    with pytest.raises(ValueError, match="does not match"):
        megakernel_greedy_decode(
            dec, variables, qparams, th, z, 4, text_mask=tm, ref_hidden=rh,
            ref_mask=rm, weight_dtype="int8", kv_dtype="int8",
            weight_plan=wp_bf16,
        )
