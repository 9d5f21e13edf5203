"""Benchmark: autoregressive decode throughput on the flagship decoder.

Prints ONE JSON line:
    {"metric": "decode_tokens_per_sec_per_chip", "value": N,
     "unit": "tokens/s", "vs_baseline": N / 5000}

Scenario (the synthesis hot path, BASELINE.md north-star): greedy-decode a
full 12.8 s utterance — 1024 codec frames x 5 quantizer streams = 5120 audio
tokens — conditioned on a 3 s voice prompt (240 frames x 5 = 1200 reference
tokens) and a 50-phoneme text, batch 1, on one chip.  RTF = wall / 12.8 s.

Serving posture: weights are CLOSED OVER by the jitted decode (compile-time
constants, fixed per checkpoint) — measured +41% over params-as-arguments on
v5e (XLA pins the ~93 MB of weights + 20 MB K/V in the 128 MB VMEM instead
of re-streaming them from HBM every step).  Headline = the fastest correct
B=1 serving path: the decode megakernel (ops/decode_megakernel.py — the whole
greedy decode as ONE pallas_call, int8 weights VMEM-resident) when it
compiles in time, else the bf16 step scan.  Extras report the bf16 scan, the
int8 weight-streaming scan (ops/int8_matvec.py) and the B=8 batched shape.

Extras include roofline accounting vs HBM peak; with constants resident in
VMEM the B=1 "HBM fraction" exceeds 1 by design — the bytes simply no longer
move through HBM.  B=8 K/V (8 x 20.5 MB) cannot fit and stays HBM-bound.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# TPU v5e (this bench's target chip): 819 GB/s HBM, 197 bf16 TFLOP/s.
HBM_PEAK = 819e9
FLOPS_PEAK = 197e12

F = 1024  # frames per stream (12.8 s of audio)
T_text, T_ref = 50, 1200  # 3 s voice prompt x 5 streams


def _cast_params_bf16(params):
    """Cast f32 params to bf16 for the bandwidth-bound decode, except the
    small f32 vocab head."""

    def cast(path, x):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        if "head" in path_str or x.dtype != jnp.float32:
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)


def _flagship_setup():
    """Flagship decoder + fixed random conditioning at the headline scenario
    shapes.  Deterministic (seed 0) so every invocation — including the
    megakernel child process — traces byte-identical HLO and hits the
    remote-compile cache."""
    from __graft_entry__ import _flagship_cfg
    from mamba_tts_tpu.infer.quant_decode import quantize_decoder_params
    from mamba_tts_tpu.models.decoder import MambaTTSDecoder

    cfg = _flagship_cfg()
    dec = MambaTTSDecoder(cfg)
    Q = cfg.num_quantizers

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    audio_tokens = jax.random.randint(ks[0], (1, Q, 8), 2, cfg.vocab_size_audio)
    th1 = jax.random.normal(ks[1], (1, T_text, cfg.d_model), jnp.bfloat16)
    z1 = jax.random.normal(ks[2], (1, cfg.d_style), jnp.bfloat16)
    rh1 = jax.random.normal(ks[3], (1, T_ref, cfg.d_model), jnp.bfloat16)

    variables = dec.init(
        ks[4], audio_tokens, th1, z1, jnp.ones((1, T_text), bool), rh1,
        jnp.ones((1, T_ref), bool),
    )
    variables = {"params": _cast_params_bf16(variables["params"])}
    qparams = quantize_decoder_params(variables["params"], cfg)
    return cfg, dec, variables, qparams, th1, z1, rh1


def _timeit(fn, reps=3):
    # device_get (not block_until_ready) — the tunneled TPU backend's
    # block_until_ready does not reliably block.
    jax.device_get(fn())  # compile + warm-up
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _mega_child():
    """Child-process entry: megakernel decode at the headline scenario.
    Runs in a subprocess so a cold Mosaic compile (minutes on the
    remote-compile service) can time out without hanging the bench."""
    from mamba_tts_tpu.ops.decode_megakernel import megakernel_greedy_decode

    cfg, dec, variables, qparams, th1, z1, rh1 = _flagship_setup()

    def make(B, wd="bfloat16", kvd="bfloat16"):
        th = jnp.broadcast_to(th1, (B, T_text, cfg.d_model))
        z = jnp.broadcast_to(z1, (B, cfg.d_style))
        rh = jnp.broadcast_to(rh1, (B, T_ref, cfg.d_model))
        tm = jnp.ones((B, T_text), bool)
        rm = jnp.ones((B, T_ref), bool)
        return jax.jit(
            lambda: megakernel_greedy_decode(
                dec, variables, qparams, th, z, F, text_mask=tm,
                ref_hidden=rh, ref_mask=rm, interpret=False,
                weight_dtype=wd, kv_dtype=kvd,
            ).tokens
        )

    wall = _timeit(make(1))
    out = {
        "tokens_per_sec": round(cfg.num_quantizers * F / wall, 1),
        "wall_s": round(wall, 4),
    }
    # batched residency variants (per-B dtype choices that fit VMEM; see
    # infer.synthesize._megakernel_dtypes)
    for key, B, wd, kvd in (("b2_tokens_per_sec", 2, "bfloat16", "bfloat16"),
                            ("b8_tokens_per_sec", 8, "int8", "int8")):
        try:
            wallb = _timeit(make(B, wd, kvd), reps=2)
            out[key] = round(B * cfg.num_quantizers * F / wallb, 1)
        except Exception as e:
            out[key] = f"error: {type(e).__name__}"
    print(json.dumps(out))


def main():
    from mamba_tts_tpu.infer.quant_decode import greedy_decode_int8
    from mamba_tts_tpu.models.decoder import greedy_decode

    t_start = time.monotonic()
    # total wall budget: the remote-compile cache evicts within hours, so a
    # fully cold run can cost ~25 min of step-scan compiles + two child
    # processes; child timeouts shrink to whatever budget remains so the
    # headline ALWAYS prints.
    budget_s = float(__import__("os").environ.get("BENCH_BUDGET_S", 2700))

    def remaining():
        return budget_s - (time.monotonic() - t_start)

    cfg, dec, variables, qparams, th1, z1, rh1 = _flagship_setup()
    Q = cfg.num_quantizers

    def make_fn(B, kind):
        th = jnp.broadcast_to(th1, (B, T_text, cfg.d_model))
        z = jnp.broadcast_to(z1, (B, cfg.d_style))
        rh = jnp.broadcast_to(rh1, (B, T_ref, cfg.d_model))
        tm = jnp.ones((B, T_text), bool)
        rm = jnp.ones((B, T_ref), bool)
        # unroll=8 wins at B=1 (weight-streaming overlap); batched decode is
        # KV-bound and prefers no unrolling (benchmarks/batched_decode_bench).
        unroll = 8 if B == 1 else 1
        if kind == "int8":
            # Batched decode is K/V-traffic-bound: int8 K/V (per-channel,
            # quant_decode.quantize_kv) halves the dominant term — measured
            # 22.3k vs 19.5k tok/s at B=8 on v5e.  At B=1 the K/V read is
            # small next to the weight read; full-precision K/V wins there.
            return jax.jit(
                lambda: greedy_decode_int8(
                    dec, variables, qparams, th, z, F, text_mask=tm,
                    ref_hidden=rh, ref_mask=rm, unroll=unroll,
                    int8_kv=(B > 1),
                ).tokens
            )
        return jax.jit(
            lambda: greedy_decode(
                dec, variables, th, z, F, text_mask=tm,
                ref_hidden=rh, ref_mask=rm, unroll=unroll,
            ).tokens
        )

    best = _timeit(make_fn(1, "bf16"))
    extras = {"bf16_tokens_per_sec_b1": round(Q * F / best, 1)}

    # Megakernel decode FIRST (the fastest serving path and the headline when
    # it succeeds): isolated in a child process with a hard timeout — a cold
    # Mosaic compile takes minutes on the remote-compile service and must
    # never wedge the bench.  Ordering matters: a fully cold run spends most
    # of its wall on compiles, so headline-critical work runs before the
    # step-scan extras (which skip gracefully when the budget runs low).
    decode_path = "bf16_step_scan"
    try:
        child = subprocess.run(
            [sys.executable, __file__, "--megakernel-child"],
            capture_output=True, text=True,
            timeout=max(120, min(1500, remaining() - 300)), check=True,
        )
        mega = json.loads(child.stdout.strip().splitlines()[-1])
        extras["megakernel_tokens_per_sec_b1"] = mega["tokens_per_sec"]
        extras["megakernel_tokens_per_sec_b2"] = mega.get("b2_tokens_per_sec")
        extras["megakernel_tokens_per_sec_b8"] = mega.get("b8_tokens_per_sec")
        if mega["wall_s"] < best:
            best = mega["wall_s"]
            decode_path = "megakernel"
    except Exception as e:
        extras["megakernel_tokens_per_sec_b1"] = f"error: {type(e).__name__}"

    for B, kind, key in ((1, "int8", "int8_tokens_per_sec_b1"),
                         (8, "int8", "int8_tokens_per_sec_b8"),
                         (8, "bf16", "batched_tokens_per_sec_b8")):
        if remaining() < 420:  # each entry may cost a multi-minute compile
            extras[key] = "skipped: budget"
            continue
        try:
            wall = _timeit(make_fn(B, kind), reps=2)
            extras[key] = round(B * Q * F / wall, 1)
            if key == "batched_tokens_per_sec_b8":
                extras["wall_s_b8"] = round(wall, 3)
        except Exception as e:  # keep the headline robust
            extras[key] = f"error: {type(e).__name__}"

    # End-to-end serving RTF (G2P + encoders + decode + vocoder), same
    # child-with-timeout pattern (benchmarks/e2e_synthesis_bench.py).
    try:
        child = subprocess.run(
            [sys.executable, "benchmarks/e2e_synthesis_bench.py", "--runs", "2"],
            capture_output=True, text=True,
            timeout=max(120, min(1650, remaining() - 60)), check=True,
        )
        e2e = json.loads(child.stdout.strip().splitlines()[-1])
        extras["e2e_rtf"] = e2e["e2e_rtf"]
    except Exception as e:
        extras["e2e_rtf"] = f"error: {type(e).__name__}"

    # ---- roofline accounting (per decode step = one token per sequence) ---
    def _bytes(t):
        return int(t.size) * t.dtype.itemsize

    param_bytes = sum(_bytes(p) for p in jax.tree.leaves(variables))
    kv_bytes_per_example = cfg.n_layers * 2 * (T_ref + T_text) * cfg.d_model * 2
    m = cfg.with_mamba_dims().mamba
    state_bytes_per_example = cfg.n_layers * (
        2 * m.d_state * m.d_inner * 4 + m.d_conv * m.d_inner * 2
    )

    def roofline(batch, wall):
        step_bytes = param_bytes + batch * (kv_bytes_per_example + state_bytes_per_example)
        achieved = step_bytes * Q * F / wall
        return {
            "streamed_gb_per_s": round(achieved / 1e9, 1),
            "hbm_peak_frac": round(achieved / HBM_PEAK, 3),
        }

    total_tokens = Q * F
    tps = total_tokens / best
    audio_seconds = F / 80.0  # 80 codec frames per second
    rtf = best / audio_seconds

    result = {
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps / 5000.0, 3),
        "extra": {
            "rtf": round(rtf, 4),
            "wall_s": round(best, 3),
            "tokens": total_tokens,
            "batch": 1,
            "decode_path": decode_path,
            "vocab": cfg.vocab_size_audio,
            **extras,
            # >1.0 at B=1 means the constant-folded weights+KV live in VMEM
            # and no longer stream from HBM (see module docstring).
            "roofline_b1": roofline(1, best),
            "roofline_b8": (
                roofline(8, 8 * Q * F / extras["batched_tokens_per_sec_b8"])
                if isinstance(extras.get("batched_tokens_per_sec_b8"), float)
                else None
            ),
            "param_mb": round(param_bytes / 1e6, 1),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--megakernel-child" in sys.argv:
        _mega_child()
    else:
        main()
