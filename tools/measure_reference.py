"""Measure the PyTorch reference's rollout throughput on this machine.

Implements BASELINE.md's measurement protocol step 1: run the reference's
prefix-recompute autoregressive rollout (utils/train_utils.py:202-207) on
the reference TemporalModel at the north-star scale (multiphase: E=2048,
1 layer, 8 heads, 250 steps; cylinder: E=1024, 399 steps) and record
steps/sec. torch runs CPU-only in this image (the reference targets CUDA,
which is unavailable); the measured number is recorded alongside the
hardware so vs_baseline ratios are interpretable.

Writes BASELINE_MEASURED.json at the repo root. Run once; bench.py reads it.
"""

import json
import os
import platform
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

torch.set_num_threads(os.cpu_count() or 8)


def measure(embed_dim: int, steps: int, ln_type: str, *, batch: int = 1,
            warmup_steps: int = 3) -> float:
    from models.temporal import TemporalModel
    torch.manual_seed(0)
    model = TemporalModel(
        num_layers=1, embed_dim=embed_dim, n_heads=8, max_len=2024,
        scale_ratio=8, src_len=0, num_variables=2, down_proj=2, dropout=0.0,
        exchange_mode="sea", pos_encoding_mode="learnable",
        ib_scale_mode="mlp", ib_addition_mode="add", ib_mlp_layers=1,
        ib_num=1, add_info_after_cross=True, LN_type=ln_type).eval()

    data = torch.randn(batch, 1, 2, embed_dim)
    ib = torch.randn(batch, steps, 1)

    with torch.no_grad():
        # Warmup a few steps (allocator, threading).
        autoreg = data.clone()
        for i in range(warmup_steps):
            out = model(autoreg, ib[:, : i + 1])
            autoreg = torch.cat((autoreg, out[:, -1:]), dim=1)

        autoreg = data.clone()
        t0 = time.perf_counter()
        for i in range(steps):
            out = model(autoreg, ib[:, : i + 1])
            autoreg = torch.cat((autoreg, out[:, -1:]), dim=1)
        elapsed = time.perf_counter() - t0
    return steps / elapsed


def main():
    results = {
        "hardware": f"cpu ({platform.processor() or platform.machine()}, "
                    f"{os.cpu_count()} threads) — reference targets CUDA, "
                    "unavailable in this image",
        "protocol": "prefix-recompute rollout, batch=1, eval mode, "
                    "utils/train_utils.py:202-207",
    }
    print("measuring multiphase (E=2048, 250 steps)...")
    results["multiphase_250step_steps_per_sec"] = measure(2048, 250, "ln")
    print(f"  {results['multiphase_250step_steps_per_sec']:.3f} steps/s")
    print("measuring cylinder (E=1024, 399 steps)...")
    results["cylinder_399step_steps_per_sec"] = measure(1024, 399, "adaln")
    print(f"  {results['cylinder_399step_steps_per_sec']:.3f} steps/s")

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "BASELINE_MEASURED.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
