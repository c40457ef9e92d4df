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

import numpy as np

argv = sys.argv[1:]
champion = None
if "--champion" in argv:
    i = argv.index("--champion")
    champion = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
dirs = argv or ["artifacts/quality/r3_stats"]
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

# ---------------------------------------------------------------------------
# Paired per-sequence comparisons (round 5, VERDICT r4 item 2).  Every
# model in a stats run is evaluated on IDENTICAL camera draws
# (main_psnr_stats.py --seed, same for every model row), and the
# per-sequence per-field means ride along in hist_<vol>_<model>.npz as
# seq_<field> arrays in sequence order.  The marginal per-sequence stds
# above mix camera-to-camera variation (+-12-14 dB on hard volumes) into
# A-vs-B questions where it cancels exactly; here we difference the two
# models on each common camera first, then test the mean difference with
# a paired t test (df = nseq - 1).  Reference analogue:
# mainPSNR2_AllAngles.py:419-438 reports per-camera spread per model; the
# pairing is the natural next step its common-camera design enables.
# ---------------------------------------------------------------------------
# two-sided 95% t critical values by df (conservative fallback 1.96)
_TCRIT = {1: 12.71, 2: 4.30, 3: 3.18, 4: 2.78, 5: 2.57, 6: 2.45,
          7: 2.36, 8: 2.31, 9: 2.26, 10: 2.23, 11: 2.20, 12: 2.18,
          14: 2.14, 19: 2.09, 24: 2.06, 29: 2.05}


def tcrit(df):
    if df in _TCRIT:
        return _TCRIT[df]
    for k in sorted(_TCRIT, reverse=True):
        if df >= k:
            return _TCRIT[k]
    return float("inf")


PAIR_FIELDS = {"PSNR-normal": "seq_psnr_normal",
               "PSNR-depth": "seq_psnr_depth",
               "PSNR-ao": "seq_psnr_ao",
               "PSNR-color-noAO": "seq_psnr_color_noAO",
               "PSNR-color-withAO": "seq_psnr_color_withAO"}

npz_files = {}                    # vol -> {model: npz path}
for d in dirs:
    for f in glob.glob(os.path.join(d, "hist_*.npz")):
        base = os.path.basename(f)[5:-4]       # <vol>_<model>
        for vol in list(files) + ORDER:
            if base.startswith(vol + "_"):
                npz_files.setdefault(vol, {})[base[len(vol) + 1:]] = f
                break

have_seq = {}                     # vol -> {model: {field: np.array}}
for vol, models in npz_files.items():
    for m, path in models.items():
        d = np.load(path)
        if any(k.startswith("seq_") for k in d.files):
            have_seq.setdefault(vol, {})[m] = {
                k: d[k] for k in d.files if k.startswith("seq_")}

if have_seq:
    champs = [champion] if champion else []
    if not champs:
        # default: the highest-numbered runNNNNN present
        names = {m for models in have_seq.values() for m in models}
        runs = sorted(n for n in names if n.startswith("run"))
        champs = runs[-1:] or []
    for champ in champs:
        print(f"\n### Paired per-sequence deltas: {champ} minus each "
              "model (common cameras, 95% paired t)\n")
        print("| volume | vs model | " + " | ".join(PAIR_FIELDS) + " |")
        print("|---|---|" + "---|" * len(PAIR_FIELDS))
        wins = ties = losses = 0
        for vol in [v for v in ORDER if v in have_seq] + sorted(
                v for v in have_seq if v not in ORDER):
            models = have_seq[vol]
            if champ not in models:
                continue
            for m in models:
                if m == champ:
                    continue
                cells = []
                for col, key in PAIR_FIELDS.items():
                    a = models[champ].get(key)
                    b = models[m].get(key)
                    if a is None or b is None or len(a) != len(b) \
                            or len(a) < 2:
                        cells.append("-")
                        continue
                    diff = np.asarray(a, np.float64) - np.asarray(
                        b, np.float64)
                    n = len(diff)
                    mean = diff.mean()
                    sem = diff.std(ddof=1) / np.sqrt(n)
                    decided = sem > 0 and abs(mean) > tcrit(n - 1) * sem
                    mark = ("**win**" if mean > 0 else "**loss**") \
                        if decided else "tie"
                    if decided and mean > 0:
                        wins += 1
                    elif decided:
                        losses += 1
                    else:
                        ties += 1
                    cells.append(f"{mean:+.3f}±{sem:.3f} {mark}")
                print(f"| {vol} | {m} | " + " | ".join(cells) + " |")
        print(f"\npaired verdicts for {champ}: {wins} wins, "
              f"{ties} ties, {losses} losses")
else:
    print("\n(no seq_* arrays in any hist npz - paired analysis "
          "needs stats runs made after the per-sequence persist)")
