#!/usr/bin/env python
"""Paired quality comparison between two evaluate.py --json dumps.

Usage: compare_eval.py A.json B.json   (reports B − A)

For each seed the two runs share, pairs images by filename and computes the
per-image PSNR/SSIM delta; reports the mean paired delta ± std, the
across-seed mean-delta ± std, and a sign test.  A claim like "student beats
teacher" is defensible when the across-seed delta mean clears its own std
(VERDICT r3 weak #1: a single-seed +0.08 dB margin vs a 0.2 dB seed swing).

The reference computes no quality metrics at all
(``/root/reference/src/training/trainer.py`` logs loss only), so this tool
has no reference analogue — it is the evidence standard for this repo's
quality claims.
"""

import json
import sys

import numpy as np


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    a = json.loads(open(sys.argv[1]).read())
    b = json.loads(open(sys.argv[2]).read())
    shared = sorted(set(a["seeds"]) & set(b["seeds"]), key=int)
    if not shared:
        sys.exit("no shared seeds between the two runs")

    print(f"A = {a['model']} ({a['num_steps']} steps, "
          f"det={a.get('deterministic')})")
    print(f"B = {b['model']} ({b['num_steps']} steps, "
          f"det={b.get('deterministic')})")
    print(f"shared seeds: {', '.join(shared)}\n")

    seed_dpsnr, seed_dssim = [], []
    all_dpsnr = []
    for s in shared:
        fa = {f: i for i, f in enumerate(a["seeds"][s]["files"])}
        fb = {f: i for i, f in enumerate(b["seeds"][s]["files"])}
        common = sorted(set(fa) & set(fb))
        dp = np.array([b["seeds"][s]["psnr"][fb[f]]
                       - a["seeds"][s]["psnr"][fa[f]] for f in common])
        dss = np.array([b["seeds"][s]["ssim"][fb[f]]
                        - a["seeds"][s]["ssim"][fa[f]] for f in common])
        seed_dpsnr.append(dp.mean())
        seed_dssim.append(dss.mean())
        all_dpsnr.extend(dp.tolist())
        print(f"seed {s}: ΔPSNR {dp.mean():+.3f} ± {dp.std():.3f} dB "
              f"(paired, n={len(common)}) | ΔSSIM {dss.mean():+.4f} | "
              f"{int((dp > 0).sum())}/{len(common)} images improved")

    m, sd = np.mean(seed_dpsnr), np.std(seed_dpsnr)
    ms, sds = np.mean(seed_dssim), np.std(seed_dssim)
    n_pos = int((np.array(all_dpsnr) > 0).sum())
    n_all = len(all_dpsnr)
    print(f"\nacross {len(shared)} seeds: ΔPSNR {m:+.3f} ± {sd:.3f} dB "
          f"(std of per-seed means) | ΔSSIM {ms:+.4f} ± {sds:.4f}")
    print(f"pooled sign test: {n_pos}/{n_all} paired images improved")
    verdict = ("DEFENSIBLE (|mean| > std across seeds)"
               if abs(m) > sd and sd > 0 else
               "DEFENSIBLE (zero variance)" if sd == 0 and m != 0 else
               "NOT defensible (inside seed noise)")
    print(f"B vs A: {'B wins' if m > 0 else 'A wins' if m < 0 else 'tie'} — "
          f"{verdict}")


if __name__ == "__main__":
    main()
