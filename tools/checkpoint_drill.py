"""Full-dims turnkey checkpoint drill (VERDICT r3 task 9).

Fabricates an 8B-dims GPTQ safetensors checkpoint + EAGLE draft dir on
disk (the exact structure tests/test_checkpoint_e2e.py exercises at small
dims), then times the production load path end-to-end:
fabricate -> create_engine (config detect, shard iteration, native mmap
read, multithreaded GPTQ repack, device_put) -> first generate.

Run: timeout 3600 python tools/checkpoint_drill.py [--dir /tmp/ckpt_drill]
    [--keep]   # keep the fabricated ~5 GB directory
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# reuse the fabricators with 8B dims
import tests.test_checkpoint_e2e as fab

fab.L, fab.H, fab.NH, fab.KVH, fab.D = 32, 4096, 32, 2, 128
fab.I, fab.V, fab.VFR = 16384, 73448, 8192


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ckpt_drill")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    base = os.path.join(args.dir, "minicpm4-8b-gptq-marlin")
    draft = os.path.join(args.dir, "eagle-draft")
    t0 = time.time()
    fab.fabricate_base(base)
    fab.fabricate_draft(draft)
    fab_s = time.time() - t0
    size_gb = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(args.dir) for f in fs) / 2**30
    print(json.dumps({"fabricate_s": round(fab_s, 1),
                      "size_gb": round(size_gb, 2)}), flush=True)

    from cpmcu_tpu.serve.factory import create_engine

    t0 = time.time()
    engine, _ = create_engine({
        "model_path": base, "draft_model_path": draft,
        "chunk_length": 2048, "max_total_length": 8192,
        "apply_sparse": False, "frspec_vocab_size": fab.VFR,
        "spec_window_size": 1024,
    })
    load_s = time.time() - t0
    t0 = time.time()
    toks, decode_t, prefill_t = engine.generate(
        list(np.random.default_rng(0).integers(0, fab.V, 64)),
        generation_length=16)
    first_gen_s = time.time() - t0
    print(json.dumps({
        "load_s": round(load_s, 1),
        "first_generate_s": round(first_gen_s, 1),
        "tokens": len(toks),
    }), flush=True)
    if not args.keep:
        shutil.rmtree(args.dir)


if __name__ == "__main__":
    main()
