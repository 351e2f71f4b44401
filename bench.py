"""Benchmark driver — prints ONE JSON line with the headline metric.

No-flag default: the reference's own headline operating point —
MiniCPM4-8B W4A16 + InfLLM-v2 sparse attention + EAGLE-2/FR-Spec at a
98,304-token prompt on one chip, on the correlated synthetic checkpoint
(no real checkpoint is mountable in this image) with the DISTILLED
drafter's measured accept length. vs_baseline compares against the
reference's 154.59 decode tok/s, which BASELINE.md records at a
106,850-token prompt with sparse attention engaged — the same stack at
the same operating point.

Modes: --dense, --quant, --spec [--spec-type eagle2|chain|eagle3|hier],
--sparse --prompt-len N (long-context InfLLM-v2), --batch N (continuous
batching aggregate tok/s), --prefix-bench.
"""

import argparse
import dataclasses
import json
import os
import time

import numpy as np

BASELINE_DECODE = 154.59  # reference decode tok/s (BASELINE.md)
BASELINE_PREFILL = 6530.77  # reference prefill tok/s (BASELINE.md)


DRAFTER_NOISE = None  # --drafter-noise N forces the legacy noise drafter
# (for the published accept-vs-noise curve). Default None: the realistic
# drafter is the DISTILLED one (ridge fit on teacher-forced base streams,
# tools/distill_drafter.py) named by benchmark/.distill/calibration.json —
# accept is an output of distillation, not a knob (VERDICT r3 task 3).
NOISE_FALLBACK = 0.35  # only used when distillation artifacts are absent


def make_realistic_drafter(ecfg, cfg, quant_head=False):
    """Distilled drafter when calibrated artifacts exist (and no explicit
    --drafter-noise); else the legacy noise drafter. Returns (params, kind)."""
    m = None if DRAFTER_NOISE is not None else distill_manifest()
    if m:
        from cpmcu_tpu.models.realistic import init_eagle_params_distilled

        return init_eagle_params_distilled(
            ecfg, cfg, m["drafter_path"], seed=0, quant_head=quant_head
        ), "distilled"
    from cpmcu_tpu.models.realistic import init_eagle_params_realistic

    noise = NOISE_FALLBACK if DRAFTER_NOISE is None else DRAFTER_NOISE
    return init_eagle_params_realistic(
        ecfg, cfg, seed=0, drafter_noise=noise, quant_head=quant_head
    ), f"noise{noise:g}"

HIER_DRAFT = "quant"  # hier draft-model weights: "quant" (reference
# pairing) | "bf16" (fewer tiny-kernel dispatches; bench --hier-draft)
HIER_UNROLL = "scan"  # inner-drafter layer loop: "scan" (dyn-layer kernels,
# one trace — the r3 hier op-floor fix) | True (legacy; bench --hier-unroll)

REALISTIC = False  # --realistic: correlated synthetic checkpoint (smooth
# attention -> non-saturated sparse unions; distillable drafter) instead of
# i.i.d. random weights. See cpmcu_tpu/models/realistic.py.


DISTILL_SCALE = None  # --distill-scale S: candidate override used by
# tools/calibrate_accept.py while the calibration manifest is being chosen


def distill_manifest():
    """Accept-calibration manifest written by tools/calibrate_accept.py:
    names the base difficulty knob and the distilled-drafter npz whose
    emergent accept anchors the headline (VERDICT r3 task 3). None when the
    distillation artifacts are absent (fresh checkout) — bench then falls
    back to the noise drafter and labels the run accordingly."""
    ddir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmark", ".distill")
    if DISTILL_SCALE is not None:
        drafter = os.path.join(ddir, f"drafter_s{DISTILL_SCALE:g}.npz")
        if not os.path.exists(drafter):
            return None
        return {"layer_out_scale": DISTILL_SCALE, "drafter_path": drafter}
    path = os.path.join(ddir, "calibration.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = json.load(f)
    drafter = os.path.join(ddir, m["drafter"])
    if not os.path.exists(drafter):
        return None
    m["drafter_path"] = drafter
    return m


def make_params(cfg, key):
    from cpmcu_tpu.models import llama

    if REALISTIC or os.environ.get("CPMCU_REALISTIC") == "1":
        from cpmcu_tpu.models.realistic import init_params_realistic_cached

        m = distill_manifest()
        knobs = ({"layer_out_scale": m["layer_out_scale"]}
                 if m and "layer_out_scale" in m else {})
        # disk-cached: ~4 min of numpy generation otherwise eats the
        # driver's bench timeout (first run generates + saves)
        return init_params_realistic_cached(
            cfg, seed=0,
            cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".realistic_cache"),
            **knobs,
        )
    if cfg.quant:
        from cpmcu_tpu.models.quantize import init_params_quant

        return init_params_quant(cfg, key)
    return llama.init_params(cfg, key)


def drop_outlier_reps(rates, factor=10.0):
    """Remove reps >``factor``x off the median (a wedged-tunnel stall or a
    mid-run recompile once produced a 0.12 tok/s rep whose spread entry the
    median silently absorbed — VERDICT r3 weak #7). Returns (kept, dropped
    count); the median itself is never dropped."""
    med = float(np.median(rates))
    kept = [r for r in rates if med / factor <= r <= med * factor]
    return (kept or rates), len(rates) - len(kept or rates)


def bench_decode(cfg, eng, steps=64, warmup=8, prompt_len=128, reps=5,
                 prefill_reps=3):
    """Dense/sparse decode + prefill throughput.

    Decode: ``reps`` timed repetitions of a ``steps``-token loop, MEDIAN
    reported (run-to-run spread on the tunneled chip is ~±2%, which
    straddled the baseline when one rep decided the official number —
    VERDICT r2 weak #1). Prefill: median of ``prefill_reps`` full prefills
    (one-shot prefill timings carry ±50% tunnel-RTT jitter, weak #6)."""
    import jax
    import jax.numpy as jnp

    from cpmcu_tpu.engine.engine import Engine, decode_segment

    params = make_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, eng, params)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()

    engine.prefill(ids)  # includes compile
    prefill_times = []
    for _ in range(max(1, prefill_reps)):
        engine.reset()
        t0 = time.time()
        engine.prefill(ids)
        prefill_times.append(time.time() - t0)

    seg = engine.eng.decode_segment_size
    sparse = engine.sparse_engaged()
    # all reps decode forward from the prefill; capacity for the whole run
    total = prompt_len + warmup + (reps + 1) * steps + 8

    state = {"tok": jnp.asarray(1, jnp.int32),
             "pos": jnp.asarray(prompt_len, jnp.int32)}

    def run_segments(n):
        done = 0
        while done < n:
            engine.cache, toks, engine.key = decode_segment(
                cfg, engine.params, engine.rope, engine.cache,
                state["tok"], state["pos"], engine.key,
                k=seg, temperature=0.0, top_k=0, top_p=1.0,
                attn_impl=engine.attn_impl, sparse_select=sparse,
                kv_span=engine.kv_bucket(total),
                unroll=engine.unroll_layers(1, total),
            )
            state["tok"] = toks[-1]
            state["pos"] = state["pos"] + seg
            done += seg
        np.asarray(toks)  # real sync (tunnel block_until_ready lies)
        return done

    run_segments(warmup)  # compile
    rates = []
    for _ in range(max(1, reps)):
        t0 = time.time()
        n = run_segments(steps)
        rates.append(n / (time.time() - t0))
    rates, n_outliers = drop_outlier_reps(rates)
    extra_flags = {"outlier_reps_dropped": n_outliers} if n_outliers else {}
    return {
        "decode_tok_s": float(np.median(rates)),
        "decode_spread": (round(min(rates), 2), round(max(rates), 2)),
        **extra_flags,
        "prefill_tok_s": prompt_len / float(np.median(prefill_times)),
        "prefill_spread": tuple(
            round(prompt_len / t, 1) for t in sorted(prefill_times)[::-1]
        ),
    }


def _oracle_spec_pair(cfg, ecfg):
    """Best-case accept endpoint fixture (see cpmcu_tpu.spec.oracle)."""
    from cpmcu_tpu.spec.oracle import oracle_spec_pair

    return oracle_spec_pair(cfg, ecfg)


def bench_spec(cfg, eng, steps=128, prompt_len=128, spec_type="eagle2",
               quant_draft_head=False, oracle_accept=False):
    """Spec-mode throughput. With random weights the drafter is uninformed
    (accept ~1) — this measures per-round overhead, a lower bound; real
    checkpoints reach ~2.5 accept (BASELINE.md). ``oracle_accept`` (eagle2)
    measures the accept == num_iter+1 best-case endpoint instead."""
    import jax

    from cpmcu_tpu.models import llama

    params = make_params(cfg, jax.random.PRNGKey(0))
    if REALISTIC and spec_type in ("hier", "eagle3"):
        # no realistic drafter exists for these types yet: a random drafter
        # on the realistic base pins accept ~1 while the '-real' mode suffix
        # would suggest a realistic-regime measurement (ADVICE r3)
        raise ValueError(
            f"--realistic is not supported with --spec-type {spec_type} "
            "(no distilled drafter; accept would be ~1 and mislabeled)")
    if spec_type == "chain":
        from cpmcu_tpu.engine.chain_engine import ChainSpecEngine

        # the reference's SpecMQuant pairing quantizes the chain drafter too
        # (spec_quant/spec_w4a16_gm.cuh); draft lm_head stays dense
        draft_cfg = dataclasses.replace(
            cfg, num_layers=max(2, cfg.num_layers // 8), quant_lmhead=False
        )
        dparams = make_params(draft_cfg, jax.random.PRNGKey(1))
        engine = ChainSpecEngine(cfg, draft_cfg, eng, params, dparams)
    elif spec_type == "eagle3":
        from cpmcu_tpu.engine.eagle3_engine import Eagle3Engine
        from cpmcu_tpu.spec.eagle3 import Eagle3Config, init_eagle3_params

        draft_cfg = dataclasses.replace(
            cfg, num_layers=1, quant=False, quant_lmhead=False,
            vocab_size=32768,
        )
        L = cfg.num_layers
        ecfg = Eagle3Config(
            model=draft_cfg, num_iter=2, topk_per_iter=10, tree_size=12,
            tap_layers=(1, L // 2, L - 2),
        )
        eparams = init_eagle3_params(ecfg, jax.random.PRNGKey(1))
        engine = Eagle3Engine(cfg, ecfg, eng, params, eparams)
    elif spec_type == "hier":
        from cpmcu_tpu.engine.hier_engine import HierSpecEngine
        from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

        # hier: EAGLE drafts for a small dense draft model which chains for
        # the quantized base (the reference's 0.5B-draft + 8B-base pairing)
        # reference hier headline = hier_ea_w4a16_gm_spec_w4a16_gm: BOTH the
        # chain draft model and its eagle drafter are W4A16. On TPU the
        # tiny draft-model quant matmuls are dispatch-overhead-bound, so
        # HIER_DRAFT="bf16" A/Bs dense XLA dots for the drafters (2x the
        # draft HBM bytes, far fewer Pallas dispatches).
        draft_cfg = dataclasses.replace(
            cfg, num_layers=max(2, cfg.num_layers // 8),
            hidden_size=1024, intermediate_size=4096, num_heads=16,
            head_dim=64, quant_lmhead=False,
            quant=cfg.quant and HIER_DRAFT == "quant",
        )
        ecfg = EagleConfig(
            model=dataclasses.replace(draft_cfg, num_layers=1),
            num_iter=2, topk_per_iter=10, tree_size=12,
        )
        if oracle_accept:
            # best-case bracket: all three models' greedy outputs agree by
            # construction (spec.oracle.oracle_hier_triple), so every outer
            # round emits max_chain+1 tokens at the real config's HBM cost
            from cpmcu_tpu.spec.oracle import oracle_hier_triple

            params, dparams, eparams = oracle_hier_triple(
                cfg, draft_cfg, ecfg)
        else:
            dparams = make_params(draft_cfg, jax.random.PRNGKey(1))
            eparams = init_eagle_params(ecfg, jax.random.PRNGKey(2))
        engine = HierSpecEngine(
            cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
            min_draft_length=8, inner_unroll=HIER_UNROLL,
        )
    else:
        import jax.numpy as jnp

        from cpmcu_tpu.engine.spec_engine import SpecEngine
        from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

        # W4A16 drafter layers, like the reference headline's eagle.w4a16_gm
        # (fc and the FR head stay dense, mirroring its fp16 eagle.fc/head)
        draft_cfg = dataclasses.replace(cfg, num_layers=1, quant_lmhead=False)
        vfr = 0 if oracle_accept else 32768  # FR-Spec sub-vocab (headline)
        ecfg = EagleConfig(
            model=draft_cfg, num_iter=2, topk_per_iter=10, tree_size=12,
            window=1024, use_input_norm=not oracle_accept,
            use_attn_norm=True, frspec_vocab_size=vfr,
        )
        if oracle_accept:
            params, eparams = _oracle_spec_pair(cfg, ecfg)
            engine = SpecEngine(cfg, ecfg, eng, params, eparams)
            rng = np.random.default_rng(0)
            ids = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()
            engine.generate(ids, generation_length=8)  # warmup/compile
            engine.reset()
            toks, decode_time, prefill_time = engine.generate(
                ids, generation_length=steps
            )
            n = len(toks)
            return {
                "decode_tok_s": (n - 1) / max(decode_time, 1e-9),
                "prefill_tok_s": prompt_len / max(prefill_time, 1e-9),
                "mean_accept": engine.mean_accept_length(),
            }
        if REALISTIC:
            # drafter distilled from the correlated synthetic base: accept
            # emerges from actual base/drafter argmax agreement instead of
            # an oracle construction (make_realistic_drafter)
            eparams, kind = make_realistic_drafter(
                ecfg, cfg, quant_head=quant_draft_head)
            engine = SpecEngine(cfg, ecfg, eng, params, eparams)
            rng = np.random.default_rng(0)
            ids = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()
            engine.generate(ids, generation_length=8)  # warmup/compile
            engine.reset()
            toks, decode_time, prefill_time = engine.generate(
                ids, generation_length=steps
            )
            n = len(toks)
            return {
                "decode_tok_s": (n - 1) / max(decode_time, 1e-9),
                "prefill_tok_s": prompt_len / max(prefill_time, 1e-9),
                "mean_accept": engine.mean_accept_length(),
                "drafter": kind,
            }
        eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
        H = cfg.hidden_size
        k = jax.random.PRNGKey(2)
        if quant_draft_head:
            # W4 FR head (HBM: 268MB bf16 -> 67MB, read num_iter x/round);
            # parity-affecting for the DRAFTER only — verification keeps
            # generation lossless either way
            from cpmcu_tpu.ops.quant import GROUP_SIZE, SCALE_DTYPE

            eparams["lm_head"] = {
                "q": jax.random.randint(k, (H // 8, vfr), -(2**31),
                                        2**31 - 1, jnp.int32),
                "s": jnp.full((H // GROUP_SIZE, vfr), 0.02 / H**0.5,
                              SCALE_DTYPE),
            }
        else:
            eparams["lm_head"] = {
                "w": (jax.random.normal(k, (H, vfr), jnp.float32) * 0.02
                      ).astype(cfg.jnp_dtype)
            }
        eparams["token_id_remap"] = jnp.arange(vfr, dtype=jnp.int32)
        engine = SpecEngine(cfg, ecfg, eng, params, eparams)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()
    warm = 8
    if spec_type == "hier" and oracle_accept:
        # oracle hier accepts ~max_chain+1 tokens per outer round, so a
        # warmup of 8 ends INSIDE the host-driven first round and the
        # fused hier_segment program compiles inside the timed region
        # (r4e's 2.42 tok/s "ceiling" row was ~one compile per program
        # shape). Warm up through round 1 PLUS one full segment, and time
        # at least two whole segments.
        seg = max(1, getattr(eng, "spec_segment_size", 1))
        per_round = engine.max_chain + 1
        warm = per_round + seg * per_round + 2
        steps = max(steps, 1 + 2 * seg * per_round)
    engine.generate(ids, generation_length=warm)  # warmup/compile

    engine.reset()
    toks, decode_time, prefill_time = engine.generate(ids, generation_length=steps)
    n = len(toks)
    return {
        "decode_tok_s": (n - 1) / max(decode_time, 1e-9),
        "prefill_tok_s": prompt_len / max(prefill_time, 1e-9),
        "mean_accept": engine.mean_accept_length(),
    }


def bench_sparse(cfg, eng, steps=64, prompt_len=32768):
    """Long-context InfLLM-v2: chunked sparse prefill + sparse decode."""
    cfg = dataclasses.replace(cfg, apply_sparse=True)
    return bench_decode(cfg, eng, steps=steps, warmup=8, prompt_len=prompt_len)


def bench_prefix_cache(cfg, eng, prompt_len=8192):
    """Multi-turn prefill with prefix caching (beyond the reference, which
    re-prefills every request): turn 2's prompt = turn 1's prompt + reply +
    a short new question; reports the effective prefill tok/s of turn 2
    (prompt tokens / wall time with the shared prefix reused) vs cold."""
    import jax

    from cpmcu_tpu.engine.engine import Engine

    eng = dataclasses.replace(eng, prefix_cache=True)
    params = make_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, eng, params)
    rng = np.random.default_rng(0)
    p1 = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()

    # compile warmup at the longest shapes, then forget the prefix
    _engine_turn(engine, rng.integers(0, cfg.vocab_size,
                                      size=prompt_len + 80).tolist())
    engine.reset()
    engine.forget_prefix()

    out1, _, cold_t = _engine_turn(engine, p1)
    p2 = p1 + out1 + rng.integers(0, cfg.vocab_size, size=64).tolist()
    out2, _, warm_t = _engine_turn(engine, p2)
    assert engine._last_prefill_cached >= prompt_len, "prefix not reused"
    return {
        "decode_tok_s": len(p2) / max(warm_t, 1e-9),  # effective tok/s
        "prefill_tok_s": prompt_len / max(cold_t, 1e-9),
        "cached_rows": engine._last_prefill_cached,
    }


def _engine_turn(engine, ids, n=8):
    toks, decode_t, prefill_t = engine.generate(ids, generation_length=n)
    return toks, decode_t, prefill_t


def bench_batch(cfg, eng, steps=64, prompt_len=128, batch=8, spec=False,
                oracle_accept=False):
    """Continuous batching aggregate throughput (no reference counterpart).

    Prefill (sequential per-slot admission) and lockstep decode are timed
    separately — mixing them understates both. ``spec`` layers per-slot
    chain speculation on top (random drafter => accept 1: the number is
    pure round overhead; real drafters multiply it by the accept rate)."""
    import jax

    from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine

    params = make_params(cfg, jax.random.PRNGKey(0))
    if spec == "chain":
        from cpmcu_tpu.engine.batch_chain_engine import BatchChainSpecEngine

        # the drafter is always dense-attention (SpecMQuant pairing), even
        # when the base engine runs InfLLM-v2 sparse slots
        draft_cfg = dataclasses.replace(
            cfg, num_layers=max(2, cfg.num_layers // 8), quant_lmhead=False,
            apply_sparse=False,
        )
        dparams = make_params(draft_cfg, jax.random.PRNGKey(1))
        be = BatchChainSpecEngine(cfg, draft_cfg, eng, params, dparams,
                                  max_batch=batch)
    elif spec:
        import jax.numpy as jnp

        from cpmcu_tpu.engine.batch_spec_engine import BatchSpecEngine
        from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

        draft_cfg = dataclasses.replace(cfg, num_layers=1,
                                        quant_lmhead=False)
        if oracle_accept:
            # accept == num_iter+1 endpoint for BATCHED speculation (the
            # VERDICT r2 weak-#7 row: where batched spec should beat plain
            # batching; the random drafter below measures only overhead)
            ecfg = EagleConfig(model=draft_cfg, num_iter=2, topk_per_iter=10,
                               tree_size=12, window=0, use_input_norm=False,
                               use_attn_norm=True, frspec_vocab_size=0)
            params, eparams = _oracle_spec_pair(cfg, ecfg)
        elif REALISTIC:
            ecfg = EagleConfig(model=draft_cfg, num_iter=2, topk_per_iter=10,
                               tree_size=12, window=0, use_input_norm=True,
                               use_attn_norm=True, frspec_vocab_size=32768)
            eparams, _ = make_realistic_drafter(ecfg, cfg)
        else:
            ecfg = EagleConfig(model=draft_cfg, num_iter=2, topk_per_iter=10,
                               tree_size=12, window=0, use_input_norm=True,
                               use_attn_norm=True, frspec_vocab_size=32768)
            eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
            H = cfg.hidden_size
            eparams["lm_head"] = {"w": (jax.random.normal(
                jax.random.PRNGKey(2), (H, 32768), jnp.float32
            ) * 0.02).astype(cfg.jnp_dtype)}
            eparams["token_id_remap"] = jnp.arange(32768, dtype=jnp.int32)
        be = BatchSpecEngine(cfg, ecfg, eng, params, eparams,
                             max_batch=batch)
    else:
        be = ContinuousBatchingEngine(cfg, eng, params, max_batch=batch)
    rng = np.random.default_rng(0)

    def submit_all():
        return [
            be.submit(rng.integers(0, cfg.vocab_size, size=prompt_len).tolist(),
                      max_new_tokens=steps)
            for _ in range(batch)
        ]

    submit_all()
    be.run()  # warmup/compile
    submit_all()
    t0 = time.time()
    be._admit([])  # all slot prefills
    prefill_dt = time.time() - t0
    t0 = time.time()
    # pipelined segment drain (segment N+1 dispatched before N's readback)
    n = sum(len(v) for v in be.run().values())
    dt = time.time() - t0
    out = {
        "decode_tok_s": n / dt,
        "prefill_tok_s": batch * prompt_len / max(prefill_dt, 1e-9),
        "batch": batch,
    }
    if hasattr(be, "mean_accept_length"):
        out["mean_accept"] = be.mean_accept_length()
    return out


def main():
    # persistent XLA compilation cache: repeated driver/bench runs skip the
    # 20-60s remote compiles (silently inactive if the backend can't
    # serialize executables)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", default="minicpm4-8b", choices=["minicpm4-0.5b", "minicpm4-8b"]
    )
    ap.add_argument("--v3-extract", dest="v3_extract",
                    action="store_true", default=False,
                    help="A/B: enable the quant kernel's pair-0 in-place "
                    "mask (ops.quant.TUNE['v3_extract']); measured -3.6%% "
                    "vs the default v2 shift on TPU (PERF.md)")
    ap.add_argument("--no-v3-extract", dest="v3_extract",
                    action="store_false", help=argparse.SUPPRESS)
    ap.add_argument("--prefix-bench", action="store_true",
                    help="multi-turn prefill with prefix caching: reports "
                    "turn-2 effective prefill tok/s (shared prefix reused)")
    ap.add_argument("--no-dense-fusion", dest="dense_fusion",
                    action="store_false", default=True,
                    help="A/B: disable the ops.dense decode kernels "
                    "(norm-fused + layer-indexed bf16 matmuls)")
    ap.add_argument("--init-deadline", type=int, default=300,
                    help="seconds to wait for device backend init before "
                    "emitting an error line (a wedged tunnel otherwise "
                    "hangs forever; 0 disables)")
    ap.add_argument("--quant", dest="quant", action="store_true", default=True,
                    help="W4A16 weights (default for the 8B headline)")
    ap.add_argument("--no-quant", dest="quant", action="store_false")
    ap.add_argument("--no-quant-lmhead", dest="quant_lmhead",
                    action="store_false", default=True,
                    help="keep the lm_head bf16 (the reference keeps fp16; "
                    "W4 head is the default — logits delta bounded by "
                    "tools/logits_parity.py)")
    ap.add_argument("--spec", action="store_true", help="speculative decoding")
    ap.add_argument("--dense", action="store_true",
                    help="force the plain dense decode mode (the no-flag "
                    "default is the reference-headline-matching config: "
                    "EAGLE-2+FR-Spec on the realistic checkpoint)")
    ap.add_argument("--quant-draft-head", dest="quant_draft_head",
                    action="store_true", default=None,
                    help="W4 FR-Spec draft head (eagle2 only; DEFAULT in "
                    "realistic mode — the reference quantizes its "
                    "drafters and r4a measured +3.6 tok/s at 96K)")
    ap.add_argument("--no-quant-draft-head", dest="quant_draft_head",
                    action="store_false",
                    help="bf16 FR-Spec draft head (A/B)")
    ap.add_argument("--oracle-accept", action="store_true",
                    help="oracle drafter: accept == num_iter+1 every round "
                    "(best-case endpoint; eagle2 only)")
    ap.add_argument("--hier-draft", default="quant",
                    choices=["quant", "bf16"],
                    help="hier spec draft-model weight dtype (A/B: tiny "
                    "quant matmuls are dispatch-bound on TPU)")
    ap.add_argument("--hier-unroll", action="store_true",
                    help="legacy unrolled inner-drafter layer loop (A/B vs "
                    "the default scan-over-layers dyn-layer kernels)")
    ap.add_argument("--distill-scale", type=float, default=None,
                    help="candidate layer_out_scale during accept "
                    "calibration (uses benchmark/.distill/drafter_sS.npz "
                    "instead of the manifest)")
    ap.add_argument("--drafter-noise", type=float, default=None,
                    help="force the LEGACY noise drafter with this fc1 "
                    "noise (for the published accept-vs-noise curve). "
                    "Default: the distilled drafter named by "
                    "benchmark/.distill/calibration.json — accept is an "
                    "output of distillation, not a knob")
    ap.add_argument("--realistic", action="store_true",
                    help="correlated synthetic checkpoint (smooth attention "
                    "-> non-saturated sparse unions; distilled drafter with "
                    "accept ~2.4) instead of i.i.d. random weights")
    ap.add_argument("--spec-type", default="eagle2",
                    choices=["eagle2", "chain", "eagle3", "hier"])
    ap.add_argument("--sparse", action="store_true", help="InfLLM-v2 long context")
    ap.add_argument("--oracle-union", action="store_true",
                    help="sparse best-case bracket: one stage-1 selection "
                    "per forward, so the per-tile visit union is minimal "
                    "(random weights otherwise saturate it; see PERF.md)")
    ap.add_argument("--batch", type=int, default=0, help="continuous batching slots")
    ap.add_argument("--steps", type=int, default=0,
                    help="0 = auto: 192 for the no-flag headline default "
                    "(amortizes spec pipeline fill/drain), else 64")
    # default one full chunk so prefill tok/s is not diluted by padding
    # (None sentinel: the no-flag headline default raises it to 98304)
    ap.add_argument("--prompt-len", type=int, default=None)
    ap.add_argument("--spec-segment", type=int, default=0,
                    help="override EngineConfig.spec_segment_size (0 = "
                    "default 12); A/B for dispatch-gap amortization")
    ap.add_argument("--sparse-pair", type=int, default=0,
                    help="override ops.sparse_flash TUNE['decode_pair'] "
                    "(0 = keep default); A/B for the paired sub-tile kernel")
    ap.add_argument("--prefill-pair", type=int, default=0,
                    help="override ops.sparse_flash TUNE['prefill_pair'] "
                    "(0 = keep default 1); pairs fine KV tiles at prefill")
    ap.add_argument("--tree-pair", type=int, default=0,
                    help="override ops.sparse_flash TUNE['tree_pair'] "
                    "(0 = keep default 1): spec-tree verify calls process "
                    "`pair` COARSE 512-row KV tiles per grid step (same "
                    "bytes, fewer steps — A/B for the tree call's ~40%% "
                    "per-step overhead share at 96K)")
    ap.add_argument("--max-len", type=int, default=0, help="0 = solve from HBM")
    ap.add_argument("--chunk-len", type=int, default=2048)
    args = ap.parse_args()

    # no-flag default: the reference's own headline OPERATING POINT —
    # W4A16 + InfLLM-v2 sparse attention + EAGLE-2/FR-Spec at ~100K-token
    # context with a MEASURED accept length on the correlated synthetic
    # checkpoint (BASELINE.md 154.59 decode tok/s was measured at a
    # 106,850-token prompt with sparse attention engaged, reference
    # README.md:93-105; plain random weights would pin accept at 1 and
    # saturate the sparse unions). --dense restores the plain short-ctx
    # decode mode (floor-bound at ~154 on this chip).
    if not (args.spec or args.sparse or args.batch or args.prefix_bench
            or args.dense):
        args.spec = True
        args.sparse = True
        args.realistic = True
        if args.prompt_len is None:
            args.prompt_len = 98304
        if args.steps == 0:
            args.steps = 192
    if args.steps == 0:
        args.steps = 64
    if args.prompt_len is None:
        args.prompt_len = 2048

    from cpmcu_tpu.core.config import MINICPM4_0_5B, MINICPM4_8B, EngineConfig

    cfg = {"minicpm4-0.5b": MINICPM4_0_5B, "minicpm4-8b": MINICPM4_8B}[args.config]
    if args.quant:
        cfg = dataclasses.replace(cfg, quant=True,
                                  quant_lmhead=args.quant_lmhead)
    # round UP to the cache's 512 granularity (SparseKVCache.create rounds
    # DOWN, which would swallow the generation slack at exact-page prompts).
    # 6*steps: bench_decode runs warmup + 5 timed reps forward (median)
    per_seq = max(2048, args.prompt_len + 6 * args.steps + 512)
    per_seq = (per_seq + 511) // 512 * 512
    if args.oracle_union:
        cfg = dataclasses.replace(cfg, sparse_oracle_union=True)
    if args.realistic:
        global REALISTIC
        REALISTIC = True
    global HIER_DRAFT
    HIER_DRAFT = args.hier_draft
    global HIER_UNROLL
    HIER_UNROLL = True if args.hier_unroll else "scan"
    global DRAFTER_NOISE
    DRAFTER_NOISE = args.drafter_noise
    global DISTILL_SCALE
    DISTILL_SCALE = args.distill_scale
    if args.quant_draft_head is None:
        # realistic default = W4 head (reference parity: its eagle head is
        # quantized too); synthetic A/B keeps the historical bf16 default
        args.quant_draft_head = bool(args.realistic)
    if args.v3_extract:
        from cpmcu_tpu.ops import quant as _q

        _q.TUNE["v3_extract"] = True
    if not args.dense_fusion:
        from cpmcu_tpu.ops import dense as _d

        _d.TUNE["enable"] = False
    # batch mode splits the budget across slots
    max_len = args.max_len or per_seq * max(args.batch, 1)
    eng = EngineConfig(chunk_length=args.chunk_len, max_total_length=max_len)
    if args.spec_segment:
        eng = dataclasses.replace(eng, spec_segment_size=args.spec_segment)
    if args.sparse_pair or args.prefill_pair or args.tree_pair:
        from cpmcu_tpu.ops import sparse_flash as _sf

        if args.sparse_pair:
            _sf.TUNE["decode_pair"] = args.sparse_pair
        if args.prefill_pair:
            _sf.TUNE["prefill_pair"] = args.prefill_pair
        if args.tree_pair:
            _sf.TUNE["tree_pair"] = args.tree_pair

    try:
        if args.init_deadline:
            # a wedged tunnel hangs every client in backend init for hours
            # (CLAUDE.md 2026-08-17); fail loudly with a JSON line instead
            import threading

            box = {}

            def _probe():
                import jax

                box["devices"] = jax.devices()

            t = threading.Thread(target=_probe, daemon=True)
            t.start()
            t.join(args.init_deadline)
            if t.is_alive():
                raise TimeoutError(
                    f"device backend init exceeded {args.init_deadline}s "
                    "(tunnel wedged?)"
                )
        wt = "w4a16" if args.quant else "bf16"
        extra = {}
        if args.batch:
            if args.sparse:
                cfg = dataclasses.replace(cfg, apply_sparse=True)
            if args.spec:
                assert args.spec_type in ("eagle2", "chain"), (
                    "batched speculation supports eagle2|chain")
            if args.sparse and args.spec:
                assert args.spec_type == "chain", (
                    "sparse batched speculation is chain-only")
            spec = args.spec_type if args.spec else False
            r = bench_batch(cfg, eng, steps=args.steps, prompt_len=args.prompt_len,
                            batch=args.batch, spec=spec,
                            oracle_accept=args.oracle_accept)
            if "mean_accept" in r:
                extra["mean_accept_length"] = round(r["mean_accept"], 3)
            mode = f"batch{args.batch}" + (
                f"-sparse-{args.prompt_len}ctx" if args.sparse else "") + (
                f"-{args.spec_type}-spec" if args.spec else "") + (
                "-oracle" if args.oracle_accept else "")
        elif args.sparse and args.spec:
            # the reference headline configuration: W4A16 + InfLLM-v2 +
            # EAGLE/FR-Spec at long context (README.md:93-105)
            cfg = dataclasses.replace(cfg, apply_sparse=True)
            r = bench_spec(cfg, eng, steps=args.steps, prompt_len=args.prompt_len,
                           spec_type=args.spec_type,
                           quant_draft_head=args.quant_draft_head,
                           oracle_accept=args.oracle_accept)
            extra["mean_accept_length"] = round(r["mean_accept"], 3)
            if "drafter" in r:
                extra["drafter"] = r["drafter"]
            mode = f"sparse-{args.prompt_len}ctx-{args.spec_type}-spec"
            if args.oracle_union:
                mode += "-ou"
        elif args.sparse:
            r = bench_sparse(cfg, eng, steps=args.steps, prompt_len=args.prompt_len)
            mode = f"sparse-{args.prompt_len}ctx"
            if args.oracle_union:
                mode += "-ou"
        elif args.spec:
            r = bench_spec(cfg, eng, steps=args.steps, prompt_len=args.prompt_len,
                           spec_type=args.spec_type,
                           quant_draft_head=args.quant_draft_head,
                           oracle_accept=args.oracle_accept)
            extra["mean_accept_length"] = round(r["mean_accept"], 3)
            if "drafter" in r:
                extra["drafter"] = r["drafter"]
            mode = f"{args.spec_type}-spec"
        elif args.prefix_bench:
            r = bench_prefix_cache(cfg, eng, prompt_len=args.prompt_len)
            extra["cached_rows"] = r["cached_rows"]
            mode = f"prefix-cache-{args.prompt_len}"
        else:
            r = bench_decode(cfg, eng, steps=args.steps, prompt_len=args.prompt_len)
            mode = "dense"
        if args.realistic:
            mode += "-real"
        # label the prefill number: it is NOT comparable across modes (a
        # spec-engine prefill includes the drafter's; VERDICT r3 weak #8)
        extra["prefill_tok_s"] = round(r["prefill_tok_s"], 2)
        extra["prefill_config"] = (
            ("sparse" if args.sparse else "dense")
            + f" chunked prefill, {args.prompt_len}-token prompt"
            + (", incl. drafter prefill" if args.spec else "")
            + (f", {args.batch} sequential slot prefills" if args.batch else "")
        )
        for k2 in ("decode_spread", "prefill_spread", "outlier_reps_dropped"):
            if k2 in r:
                extra[k2] = r[k2]
        print(
            json.dumps(
                {
                    "metric": f"{args.config}-{wt}-{mode} decode throughput (1 chip)",
                    "value": round(r["decode_tok_s"], 2),
                    "unit": "tok/s",
                    "vs_baseline": round(r["decode_tok_s"] / BASELINE_DECODE, 4),
                    "baseline": "reference 154.59 decode tok/s, W4A16 + "
                                "InfLLM-v2 + EAGLE/FR-Spec at a 106,850-token "
                                "prompt on A100 (reference README.md:93-105)",
                    "extra": extra,
                }
            )
        )
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "bench-error", "value": 0, "unit": "tok/s",
                          "vs_baseline": 0, "error": f"{type(e).__name__}: {e}"}))
        raise


if __name__ == "__main__":
    main()
