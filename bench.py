"""Benchmark: breath-sequences/sec (train + infer) on the flagship config.

Runs the quickstart model (cnn_linear on densenet18-1D, 20-window breath
sequences, batch 16 — BASELINE.json config #1) through jitted train and
eval steps on the available accelerator and prints ONE json line.

``vs_baseline`` compares against a CPU PyTorch-equivalent baseline of the
reference's per-sample-loop forward (measured on this host via the torch
CPU build; see --measure-torch-baseline) with a conservative stored
fallback when torch measurement is skipped.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
WINDOWS = 20
LEN = 224
STEPS = 20

# breath-sequences/sec of the reference's torch-CPU train+infer loop on
# this class of host (measured via --measure-torch-baseline; updated when
# re-measured). One "breath sequence" = one (WINDOWS,1,224) sample.
TORCH_CPU_BASELINE_SEQS_PER_SEC = None  # populated from file if present


TRAIN_SCAN = None
EVAL_SCAN = None


def build():
    global TRAIN_SCAN, EVAL_SCAN
    from deepards_tpu.models.densenet1d import densenet18
    from deepards_tpu.models.heads import CNNLinearNetwork
    from deepards_tpu.train import losses as loss_lib
    from deepards_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = CNNLinearNetwork(breath_block=densenet18())
    tx = make_optimizer(
        optimizer="sgd", learning_rate=0.001, weight_decay=1e-4,
        clip_grad=True, clip_val=0.01,
    )
    rng = np.random.default_rng(0)
    batch = {
        "data": rng.normal(size=(BATCH, WINDOWS, 1, LEN)).astype(np.float32),
        "target": np.eye(2, dtype=np.float32)[rng.integers(0, 2, BATCH)],
    }
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    train_step, eval_step, train_scan, eval_scan = make_train_step(
        model, tx, loss_lib.bce_with_logits,
        target_mode="per_sample", compute_dtype=jnp.bfloat16,
    )
    TRAIN_SCAN, EVAL_SCAN = train_scan, eval_scan
    mask = jnp.ones(BATCH, jnp.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return state, train_step, eval_step, batch, mask


def measure():
    """Steady-state train+infer throughput.

    Steps are fused with lax.scan over stacked batches (one dispatch per
    STEPS steps) — the framework's epoch-stepping mode; per-step python
    dispatch would otherwise dominate on the tunneled single chip.
    """
    state, train_step, eval_step, batch, mask = build()
    # warmup/compile single-step paths
    state, loss = train_step(state, batch, mask)
    jax.block_until_ready(loss)
    state, eval_loss, out = eval_step(state, batch, mask)
    jax.block_until_ready(out)

    # generate the stacked batches on-device (a host->device copy of
    # ~100MB through the tunneled chip would dominate the measurement)
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    stacked = {
        "data": jax.random.normal(
            k1, (STEPS, BATCH, WINDOWS, 1, LEN), jnp.float32
        ),
        "target": jax.nn.one_hot(
            jax.random.randint(k2, (STEPS, BATCH), 0, 2), 2
        ),
    }
    masks = jnp.ones((STEPS, BATCH), jnp.float32)

    train_scan = TRAIN_SCAN
    eval_scan = EVAL_SCAN

    # compile
    state2, losses = train_scan(state, stacked, masks)
    jax.block_until_ready(losses)
    state2, (els, outs) = eval_scan(state2, stacked, masks)
    jax.block_until_ready(outs)

    # median of repeats: steady-state, robust to tunnel jitter
    train_times, infer_times = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        state2, losses = train_scan(state2, stacked, masks)
        jax.block_until_ready(losses)
        train_times.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        state2, (els, outs) = eval_scan(state2, stacked, masks)
        jax.block_until_ready(outs)
        infer_times.append(time.perf_counter() - t0)

    total_seqs = 2 * STEPS * BATCH
    seqs_per_sec = total_seqs / (
        float(np.median(train_times)) + float(np.median(infer_times))
    )
    return seqs_per_sec, float(losses[-1])


def measure_torch_baseline():
    """Reference-equivalent torch CPU loop: python-level per-sample backbone
    calls (the reference's forward pattern) + backward + SGD."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class TinyDenseNetTorch(nn.Module):
        # structural stand-in of the reference densenet18-1d at the same
        # parameter scale, including its per-sample python forward loop
        def __init__(self):
            super().__init__()
            from collections import OrderedDict

            def dense_block(in_ch, layers, growth):
                mods = []
                ch = in_ch
                for i in range(layers):
                    mods.append((str(i), nn.Sequential(
                        nn.BatchNorm1d(ch, track_running_stats=False),
                        nn.ReLU(),
                        nn.Conv1d(ch, 128, 1, bias=False),
                        nn.BatchNorm1d(128, track_running_stats=False),
                        nn.ReLU(),
                        nn.Conv1d(128, growth, 3, padding=1, bias=False),
                    )))
                    ch += growth
                return mods, ch

            self.conv0 = nn.Conv1d(1, 64, 7, stride=2, padding=3, bias=False)
            self.norm0 = nn.BatchNorm1d(64, track_running_stats=False)
            self.pool0 = nn.MaxPool1d(3, 2, 1)
            blocks = []
            ch = 64
            for bi in range(4):
                mods, ch = dense_block(ch, 2, 32)
                blocks.append((mods, ch))
                if bi != 3:
                    blocks.append(("trans", nn.Sequential(
                        nn.BatchNorm1d(ch, track_running_stats=False),
                        nn.ReLU(),
                        nn.Conv1d(ch, ch // 2, 1, bias=False),
                        nn.AvgPool1d(2, 2),
                    )))
                    ch = ch // 2
            self.layers = nn.ModuleList()
            self._cat_plan = []
            for item in blocks:
                if item[0] == "trans":
                    self.layers.append(item[1])
                    self._cat_plan.append("trans")
                else:
                    for _, m in item[0]:
                        self.layers.append(m)
                        self._cat_plan.append("dense")
            self.final_norm = nn.BatchNorm1d(ch, track_running_stats=False)
            self.pool = nn.AvgPool1d(7, 1)
            self.n_out = ch

        def forward(self, x):
            h = self.pool0(torch.relu(self.norm0(self.conv0(x))))
            for plan, m in zip(self._cat_plan, self.layers):
                if plan == "dense":
                    h = torch.cat([h, m(h)], dim=1)
                else:
                    h = m(h)
            h = torch.relu(self.final_norm(h))
            h = self.pool(h)
            return h.flatten(1)

    backbone = TinyDenseNetTorch()
    linear = nn.Linear(backbone.n_out * WINDOWS, 2)
    params = list(backbone.parameters()) + list(linear.parameters())
    opt = torch.optim.SGD(params, lr=0.001, momentum=0.9, nesterov=True,
                          weight_decay=1e-4)
    crit = nn.BCEWithLogitsLoss()
    x = torch.randn(BATCH, WINDOWS, 1, LEN)
    y = torch.eye(2)[torch.randint(0, 2, (BATCH,))]

    def forward(x):
        # the reference's python-level loop over the batch dim
        # (torch_cnn_linear_network.py:104-113)
        outs = []
        for i in range(x.shape[0]):
            outs.append(linear(backbone(x[i]).view(-1)).unsqueeze(0))
        return torch.cat(outs, dim=0)

    # warmup
    loss = crit(forward(x), y)
    loss.backward()
    opt.step()
    opt.zero_grad()

    steps = 3
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = crit(forward(x), y)
        loss.backward()
        opt.step()
        opt.zero_grad()
    train_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    with torch.no_grad():
        for _ in range(steps):
            forward(x)
    infer_time = time.perf_counter() - t0
    return 2 * steps * BATCH / (train_time + infer_time)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-torch-baseline", action="store_true")
    args = ap.parse_args()

    baseline_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".torch_baseline.json"
    )
    if args.measure_torch_baseline:
        base = measure_torch_baseline()
        with open(baseline_file, "w") as f:
            json.dump({"seqs_per_sec": base}, f)
        print(json.dumps({"torch_cpu_baseline_seqs_per_sec": base}))
        return

    seqs_per_sec, loss = measure()
    baseline = TORCH_CPU_BASELINE_SEQS_PER_SEC
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            baseline = json.load(f)["seqs_per_sec"]
    vs_baseline = (seqs_per_sec / baseline) if baseline else None
    print(json.dumps({
        "metric": "breath_sequences_per_sec_train_plus_infer",
        "value": round(seqs_per_sec, 2),
        "unit": "seq/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
