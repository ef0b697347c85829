#!/usr/bin/env python
"""Strategy-table diagnosis (VERDICT r4 weak-1/#2): inexpressible or
unconverged?

STRATEGY_TABLE_r04.json shows spatial-configuration / symmetrical / uni at
CHANCE TRAIN accuracy (~0.2) under the ablation setting (9 layers, dropout
0.5, flat_adam lr 1e-3, 40 epochs) while distance fits train to 0.95 —
and data/synthetic.py:82-88 predicted spatial-configuration would see the
phase-lag sign "directly".  Two hypotheses:

* INEXPRESSIBLE — the strategy's partition structure cannot represent the
  relational feature: train accuracy stays at chance for every
  optimization setting.
* UNCONVERGED — dropout 0.5 + lr 1e-3 is simply a hostile optimization
  regime for these strategies at this depth (the reference's own best lr
  was 1e-4, report.pdf §5.1): some (lr, dropout) point fits train.

The cheapest discriminating experiment (VERDICT r4 weak-6 named it and r4
skipped it): sweep ONE failing strategy over a small (lr, dropout, epochs)
grid and watch TRAIN accuracy only.  Writes STRATEGY_DIAG_r05.json.

    python scripts/strategy_diag.py [--device tpu] [--strategy 2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (tag, lr, dropout, epochs)
GRID = [
    ("baseline_lr1e-3_do0.5", "0.001", "0.5", 40),   # the failing setting
    ("lr1e-4_do0.5", "0.0001", "0.5", 40),           # reference's best lr
    ("lr1e-3_do0", "0.001", "0.0", 40),              # drop the dropout
    ("lr1e-4_do0", "0.0001", "0.0", 40),
    ("lr3e-4_do0_80ep", "0.0003", "0.0", 80),        # more budget
]


def run_one(tag: str, lr: str, dropout: str, epochs: int, device: str,
            strategy: str) -> dict:
    cmd = [
        sys.executable, "-u", "-m", "stgcn_tpu.cli.train",
        "--train.device", device,
        "--data.synthetic", "true",
        "--data.synthetic_style", "relational",
        "--data.batch_size", "16",
        "--data.collate_mode", "fixed", "--data.fixed_len", "128",
        "--model.num_layers", "9",
        "--model.partitioning", strategy,
        "--model.dropout_rate", dropout,
        "--train.lr", lr,
        "--train.optimizer", "flat_adam",
        "--train.epochs", str(epochs),
        "--parallel.precision", "bfloat16" if device != "cpu" else "default",
    ]
    t0 = time.time()
    for attempt in range(3):
        try:
            proc = subprocess.run(cmd, cwd=REPO, capture_output=True,
                                  text=True, timeout=1500)
            break
        except subprocess.TimeoutExpired:
            print(f"# {tag}: attempt {attempt} timed out; retrying fresh",
                  file=sys.stderr, flush=True)
            time.sleep(240)
    else:
        return {"tag": tag, "rc": -1, "error": "timed out every attempt"}
    out = proc.stdout + proc.stderr
    m_test = re.search(r"\[test\] loss=([\d.]+) acc=([\d.]+) n=(\d+)", out)
    train_accs = [float(v) for v in re.findall(r"'train_acc': ([\d.]+)", out)]
    val_accs = [float(v) for v in re.findall(r"'val_acc': ([\d.]+)", out)]
    row = {
        "tag": tag, "lr": float(lr), "dropout": float(dropout),
        "epochs": epochs, "rc": proc.returncode,
        "wall_s": round(time.time() - t0, 1),
        "final_train_acc": train_accs[-1] if train_accs else None,
        "best_train_acc": max(train_accs) if train_accs else None,
        "final_val_acc": val_accs[-1] if val_accs else None,
        "test_acc": float(m_test.group(2)) if m_test else None,
        "train_acc_curve_every5": train_accs[::5] if train_accs else None,
    }
    if proc.returncode != 0:
        row["tail"] = out[-1500:]
    print(json.dumps(row), flush=True)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--strategy", default="2",
                    help="0=uni 1=distance 2=spatial 3=symmetrical")
    ap.add_argument("--only", default=None,
                    help="run a single grid tag (resumable sweep)")
    args = ap.parse_args()

    path = os.path.join(REPO, "STRATEGY_DIAG_r05.json")
    doc = {"comment": __doc__.split("\n\n")[1],
           "strategy": args.strategy, "rows": []}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    done = {r["tag"] for r in doc["rows"]}
    for tag, lr, dropout, epochs in GRID:
        if args.only and tag != args.only:
            continue
        if tag in done:
            continue
        doc["rows"].append(run_one(tag, lr, dropout, epochs, args.device,
                                   args.strategy))
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        time.sleep(80)  # lease-release cooldown between TPU subprocesses
    return 0


if __name__ == "__main__":
    sys.exit(main())
