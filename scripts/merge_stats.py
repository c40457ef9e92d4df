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
        if f.endswith("_err.tsv"):     # per-sequence spread companions
            continue
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

# ---------------------------------------------------------------------------
# Error bars: stats_<vol>_err.tsv companions (round 4) carry per-sequence
# mean/std/min/max per field.  Emit the same PSNR table as mean+-std and
# flag every win decided by less than one combined std (mean diff <
# sqrt(std_a^2 + std_b^2)/sqrt(nseq) would be overkill for range-style
# bars; we use the plain per-sequence std, the conservative choice).
# ---------------------------------------------------------------------------
ERR_FIELD = {"PSNR-normal": "psnr_normal", "PSNR-depth": "psnr_depth",
             "PSNR-ao": "psnr_ao", "PSNR-color-noAO": "psnr_color_noAO",
             "PSNR-color-withAO": "psnr_color_withAO"}
err_files = {}
for d in dirs:
    for f in glob.glob(os.path.join(d, "stats_*_err.tsv")):
        name = os.path.basename(f)[6:-8]
        err_files.setdefault(name, []).append(f)
if err_files:
    print("\n### With per-sequence error bars (mean +- std over sequences)\n")
    print("| volume | model | normal | depth | ao | color-noAO | "
          "color+AO |")
    print("|---|---|---|---|---|---|---|")
    close_calls = []
    for vol in [v for v in ORDER if v in err_files] + sorted(
            v for v in err_files if v not in ORDER):
        rows = {}          # model -> {field: (mean, std)}
        nseq = {}
        for path in err_files[vol]:
            with open(path) as f:
                header = f.readline()
                for line in f:
                    m, field, mean, std, mn, mx, ns = \
                        line.strip().split("\t")
                    rows.setdefault(m, {})[field] = (float(mean),
                                                     float(std))
                    nseq[m] = int(ns)
        models = list(rows)
        for j, col in enumerate(ERR_FIELD.values()):
            vals = [(rows[m][col][0], rows[m][col][1], m)
                    for m in models if col in rows[m]]
            vals.sort(reverse=True)
            if len(vals) >= 2 and vals[0][0] - vals[1][0] < max(
                    vals[0][1], vals[1][1]):
                close_calls.append(
                    (vol, list(ERR_FIELD)[j], vals[0][2], vals[1][2],
                     round(vals[0][0] - vals[1][0], 3)))
        for i, m in enumerate(models):
            cells = []
            best = {c: max(rows[mm][c][0] for mm in models
                           if c in rows[mm]) for c in ERR_FIELD.values()}
            for c in ERR_FIELD.values():
                if c not in rows[m]:
                    cells.append("-")
                    continue
                mean, std = rows[m][c]
                s = f"{mean:.2f}+-{std:.2f}"
                cells.append(f"**{s}**" if abs(mean - best[c]) < 5e-3
                             else s)
            print(f"| {vol if i == 0 else ''} | {m} "
                  f"(n={nseq.get(m, '?')}) | " + " | ".join(cells) + " |")
    if close_calls:
        print("\nWins within one per-sequence std (treat as ties):")
        for vol, col, a, b, d in close_calls:
            print(f"  - {vol}/{col}: {a} over {b} by {d} dB")
    else:
        print("\n(every per-channel win exceeds one per-sequence std)")
