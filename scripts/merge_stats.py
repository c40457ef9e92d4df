"""Merge per-volume stats TSVs into one README markdown table.

Usage: python scripts/merge_stats.py <dir> [<dir2> ...]
Reads stats_<volume>.tsv (main_psnr_stats output) from every given dir
(rows for the same volume are concatenated - e.g. a supplementary
single-model pass measured with the same seed/protocol) and prints the
five-analogue quality table: PSNR per channel per model, best model per
channel bolded, plus an SSIM sanity check (everything must be <= 1).
"""
import glob
import os
import sys

dirs = sys.argv[1:] or ["artifacts/quality/r3_stats"]
ORDER = ["turbulence", "ejecta", "interface", "skull", "thorax"]
PSNR_COLS = ["PSNR-normal", "PSNR-depth", "PSNR-ao", "PSNR-color-noAO",
             "PSNR-color-withAO"]

files = {}
for d in dirs:
    for f in glob.glob(os.path.join(d, "stats_*.tsv")):
        name = os.path.basename(f)[6:-4]
        files.setdefault(name, []).append(f)
vols = [v for v in ORDER if v in files] + sorted(
    v for v in files if v not in ORDER)
if not vols:
    sys.exit(f"no stats_*.tsv in {dirs}")

bad_ssim = []
print("| volume | model | normal | depth | ao | color-noAO | color+AO |")
print("|---|---|---|---|---|---|---|")
for vol in vols:
    table = []
    for path in files[vol]:
        with open(path) as f:
            header = f.readline().strip().split("\t")
            rows = [line.strip().split("\t") for line in f
                    if line.strip()]
        idx = {c: header.index(c) for c in header}
        for r in rows:
            vals = [float(r[idx[c]]) for c in PSNR_COLS]
            table.append((r[0], vals))
            for c in header:
                if c.startswith("SSIM") and float(r[idx[c]]) > 1.0 + 1e-9:
                    bad_ssim.append((vol, r[0], c, r[idx[c]]))
    best = [max(t[1][j] for t in table) for j in range(len(PSNR_COLS))]
    for i, (model, vals) in enumerate(table):
        cells = [f"**{v:.2f}**" if abs(v - best[j]) < 5e-3 else f"{v:.2f}"
                 for j, v in enumerate(vals)]
        vol_cell = vol if i == 0 else ""
        print(f"| {vol_cell} | {model} | " + " | ".join(cells) + " |")

if bad_ssim:
    print("\nWARNING: SSIM > 1 entries:", bad_ssim)
    sys.exit(1)
print("\n(all SSIM/MS-SSIM values <= 1.0)")
