"""Summarize a trainer log's epoch curve for README tables.

Usage: python scripts/train_curve.py /tmp/r3_train.log [--every 20]
Parses the `===> Epoch N: train loss L, test psnr P dB (Ts)` lines.
"""
import argparse
import re
import sys

p = argparse.ArgumentParser()
p.add_argument("log")
p.add_argument("--every", type=int, default=20)
args = p.parse_args()

rows = []
pat = re.compile(r"===> Epoch (\d+): train loss ([\d.]+), "
                 r"test psnr ([\d.]+) dB \(([\d.]+)s\)")
for line in open(args.log, errors="replace"):
    m = pat.search(line)
    if m:
        rows.append((int(m.group(1)), float(m.group(2)),
                     float(m.group(3)), float(m.group(4))))
if not rows:
    sys.exit("no epoch lines found")

print(f"epochs {rows[0][0]}..{rows[-1][0]}, "
      f"total {sum(r[3] for r in rows) / 3600:.2f} h")
print(f"{'epoch':>6} {'loss':>8} {'test psnr':>10}")
for e, loss, psnr, _ in rows:
    if e % args.every == 0 or e == rows[-1][0] or e == rows[0][0]:
        print(f"{e:6d} {loss:8.4f} {psnr:10.2f}")
best = max(rows, key=lambda r: r[2])
print(f"best test psnr {best[2]:.2f} dB at epoch {best[0]}; "
      f"last {rows[-1][2]:.2f} dB")
