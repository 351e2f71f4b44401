"""Accept calibration: pick the base difficulty whose DISTILLED drafter's
measured accept is the most conservative point at or below the reference's
published 2.50 (reference README.md:102), then freeze it in
benchmark/.distill/calibration.json.

The knob being calibrated is the BASE's context-dependence
(``layer_out_scale`` — how much the 32 layers' residual deltas perturb the
token-identity signal). The drafter is never dialed: for every candidate
base it is the ridge-distillation OPTIMUM (tools/distill_drafter.py), so
the resulting accept is an emergent property of base predictability, with
the single published reference number as the external anchor.

Run (TPU; after gen_distill_corpus + distill_drafter):
    python tools/calibrate_accept.py [--scales 0.05,0.2,0.5]
"""

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = 2.50  # reference mean accept (BASELINE.md / README.md:102)


def measure(scale: float, steps: int = 192) -> dict:
    """One candidate row; a timeout/parse failure skips the candidate
    instead of killing the whole calibration (the r4d run died on its
    FIRST row when fresh post-kernel-fix compiles blew a 1500 s cap and
    TimeoutExpired propagated — the headline then silently fell back to
    the noise drafter)."""
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--spec",
           "--realistic", "--distill-scale", f"{scale:g}",
           "--steps", str(steps)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=2400, cwd=REPO)
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception as e:  # TimeoutExpired, IndexError, JSONDecodeError
        return {"value": None, "extra": {},
                "error": f"{type(e).__name__}: {e}"}


def proxy_of(ddir: str, scale: float) -> float:
    """chain_accept_proxy recorded by the fit — used to order candidates
    (best first, so a deadline leaves the most useful rows measured) and
    to skip known-degenerate bases (proxy ~1: argmax-tie regime)."""
    import numpy as np

    path = os.path.join(ddir, f"drafter_s{scale:g}.npz")
    try:
        return float(np.load(path)["chain_accept_proxy"])
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="")
    ap.add_argument("--dry", action="store_true",
                    help="pick from recorded rows in calibration_sweep.jsonl "
                    "without running bench")
    args = ap.parse_args()

    ddir = os.path.join(REPO, "benchmark", ".distill")
    rows_path = os.path.join(ddir, "calibration_sweep.jsonl")
    rows = []
    if args.dry and os.path.exists(rows_path):
        with open(rows_path) as f:
            rows = [json.loads(x) for x in f if x.strip()]
    else:
        if args.scales:
            scales = [float(x) for x in args.scales.split(",")]
        else:
            scales = sorted(
                float(os.path.basename(p)[len("drafter_s"):-len(".npz")])
                for p in glob.glob(os.path.join(ddir, "drafter_s*.npz")))
        assert scales, "run gen_distill_corpus + distill_drafter first"
        # measure best-proxy first; drop degenerate bases (proxy < 1.2)
        scales = sorted((s for s in scales if proxy_of(ddir, s) >= 1.2),
                        key=lambda s: -proxy_of(ddir, s)) or scales
        with open(rows_path, "a") as f:
            for s in scales:
                r = measure(s)
                row = {"layer_out_scale": s,
                       "accept": r["extra"].get("mean_accept_length"),
                       "decode_tok_s": r["value"],
                       "drafter": r["extra"].get("drafter")}
                if "error" in r:
                    row["error"] = r["error"]
                rows.append(row)
                f.write(json.dumps(row) + "\n")
                print(json.dumps(row), flush=True)

    ok = [r for r in rows if r.get("accept") and r["drafter"] == "distilled"]
    assert ok, "no distilled rows measured"
    # nearest-to-anchor, straddling allowed (VERDICT r4 task 3): the old
    # most-conservative-below rule guaranteed landing under the gate's
    # lower edge whenever no candidate sat exactly at 2.50. Candidates
    # SHOULD straddle the anchor — a finer layer_out_scale grid between
    # the two nearest existing scales gets there, at ~41 min of chip per
    # scale for corpus gen (r4f_corpus.log: 2440.7 s/scale).
    pick = min(ok, key=lambda r: abs(r["accept"] - TARGET))
    manifest = {
        "layer_out_scale": pick["layer_out_scale"],
        "drafter": f"drafter_s{pick['layer_out_scale']:g}.npz",
        "measured_accept": pick["accept"],
        "anchor": f"reference mean accept {TARGET} (README.md:102); pick = "
                  "nearest measured accept to anchor over distilled "
                  "candidates (straddling allowed)",
        "candidates": rows,
    }
    with open(os.path.join(ddir, "calibration.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps({"picked": pick}, indent=None))


if __name__ == "__main__":
    main()
