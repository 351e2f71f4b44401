"""Generate the EAGLE-drafter distillation corpus on the TPU.

For each requested base difficulty (``layer_out_scale``), runs the realistic
W4A16 base greedily on random prompts to produce self-generated token
streams, then teacher-forces each stream once to capture the post-final-norm
hidden of every position (the EAGLE drafter's input/regression feature —
reference eagle training uses exactly these features; spec/eagle.py
EagleState.prev_hidden).

The corpus is what tools/distill_drafter.py fits fc1/fc2 against, making the
drafter's accept length an OUTPUT of distillation instead of a noise knob
(VERDICT r3 task 3).

Run (TPU): timeout 3000 python tools/gen_distill_corpus.py \
    --scales 0.05,0.2,0.5 --streams 4 --gen 3840
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig


def capture_hiddens(cfg, engine, seq):
    """Teacher-forced post-final-norm hidden for every position of ``seq``."""
    from cpmcu_tpu.engine.engine import chunk_width
    from cpmcu_tpu.models import llama

    engine.reset()
    C = engine.eng.chunk_length
    out = []
    for i in range(0, len(seq), C):
        n = min(len(seq) - i, C)
        cw = chunk_width(n, C)
        chunk = np.zeros((cw,), np.int32)
        chunk[:n] = seq[i:i + n]
        pos = np.arange(i, i + cw, dtype=np.int32)
        h, engine.cache, normed = llama.forward(
            cfg, engine.params, engine.rope, engine.cache,
            jnp.asarray(chunk), jnp.asarray(pos),
            logits_mode="none", return_hidden=True,
            attn_impl=engine.attn_impl,
        )
        out.append(np.asarray(normed[:n]))
        engine.commit(n, max_new=cw)
    return np.concatenate(out, axis=0)  # (T, H) bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="0.05,0.2,0.5",
                    help="layer_out_scale values (base difficulty sweep)")
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--prompt", type=int, default=256)
    ap.add_argument("--gen", type=int, default=3840)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmark", ".distill"))
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    os.makedirs(args.out, exist_ok=True)

    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.models.realistic import init_params_realistic_cached

    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048,
                       max_total_length=args.prompt + args.gen + 1024)
    cache_dir = os.path.join(os.path.dirname(args.out), "..",
                             ".realistic_cache")
    cache_dir = os.path.normpath(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".realistic_cache"))

    for s in [float(x) for x in args.scales.split(",")]:
        t0 = time.time()
        params = init_params_realistic_cached(cfg, seed=0,
                                              cache_dir=cache_dir,
                                              layer_out_scale=s)
        engine = Engine(cfg, eng, params)
        T = args.prompt + args.gen
        stream_paths = []
        for i in range(args.streams):
            spath = os.path.join(args.out, f"corpus_s{s:g}_stream{i}.npz")
            stream_paths.append(spath)
            if os.path.exists(spath):
                print(json.dumps({"scale": s, "stream": i, "resumed": spath}),
                      flush=True)
                continue
            rng = np.random.default_rng(1000 + i)
            prompt = rng.integers(0, cfg.vocab_size,
                                  size=args.prompt).tolist()
            # reset BEFORE generate: prefill appends at host_len, and the
            # previous stream's capture_hiddens left the cache full — without
            # this the capacity guard truncates every stream after the first
            # (r4c crash: T=1009 vs 4096 ragged np.stack).
            engine.reset()
            gen, _, _ = engine.generate(prompt,
                                        generation_length=args.gen + 1)
            seq = np.asarray(prompt + gen[:args.gen], np.int32)
            assert len(seq) == T, (
                f"stream {i} truncated at {len(seq)} (< {T}): capacity guard "
                f"fired — check max_total_length vs prompt+gen")
            hid = capture_hiddens(cfg, engine, seq)
            np.savez(spath, tokens=seq, hidden=hid.view(np.uint16))
            print(json.dumps({"scale": s, "stream": i, "T": len(seq),
                              "uniq_frac": round(
                                  len(set(seq.tolist())) / len(seq), 3)}),
                  flush=True)
        toks_all = []
        hid_all = []
        for spath in stream_paths:
            d = np.load(spath)
            toks_all.append(d["tokens"])
            hid_all.append(d["hidden"])
        path = os.path.join(args.out, f"corpus_s{s:g}.npz")
        np.savez(path, tokens=np.stack(toks_all), hidden=np.stack(hid_all),
                 layer_out_scale=np.float64(s))
        print(json.dumps({"scale": s, "saved": path,
                          "secs": round(time.time() - t0, 1)}), flush=True)
        del engine, params


if __name__ == "__main__":
    main()
