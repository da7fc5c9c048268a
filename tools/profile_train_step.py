"""Per-op time breakdown of the temporal train step (MFU work, VERDICT r2 #2).

Captures a jax.profiler device trace around N jitted train steps and
converts it with tensorboard_plugin_profile into a framework-op-stats
table, printing the top ops by self time plus a category rollup
(matmul / elementwise / reduce / other). This is the measurement that
directs kernel-fusion work — BASELINE.md's train-MFU rows cite it.

Usage: python tools/profile_train_step.py [--case multiphase|cylinder]
       [--dtype f32|bf16|bf16_mixed] [--impl auto|xla] [--steps 5]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def capture(case_name, dtype, impl, steps, logdir, batch=None,
            mu_dtype="float32", optimizer="adamw"):
    import sea_tpu.ops.flash_attention as _fa
    if impl == "xla":
        _fa.flash_supported = lambda *a, **k: False
    from bench_training import build  # same harness as the MFU bench
    from sea_tpu.models.temporal import init_temporal

    cfg, step, tx, B, T = build(case_name, impl, dtype, batch=batch,
                                mu_dtype=mu_dtype, optimizer=optimizer)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))

    params, opt_state, stats = step(params, opt_state, src, tgt, ib,
                                    jax.random.PRNGKey(2))
    float(stats["loss"])  # compile + warm (host readback = reliable fence)

    with jax.profiler.trace(logdir):
        for i in range(steps):
            params, opt_state, stats = step(params, opt_state, src, tgt,
                                            ib, jax.random.fold_in(key, i))
        float(stats["loss"])


def _summarize_xspace_direct(xspaces, steps):
    """Direct XSpace parse — used when tensorboard_plugin_profile's
    converter is broken in the image (its TF pywrap entry point drifts
    between versions). Aggregates device self-time per HLO op from the
    'XLA Ops' line of the TPU plane; categories come from the compiler's
    own hlo_category stat, so the rollup matches the plugin's."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    ops = {}
    for path in xspaces:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            smeta = plane.stat_metadata
            emeta = plane.event_metadata
            dur_id = next((i for i, m in smeta.items()
                           if m.name == "device_duration_ps"), None)
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    m = emeta[ev.metadata_id]
                    cat = src = ""
                    for st in m.stats:
                        n = smeta[st.metadata_id].name
                        if n == "hlo_category":
                            cat = st.str_value
                        elif n == "source":
                            src = st.str_value
                    dur = ev.duration_ps
                    for st in ev.stats:
                        if dur_id is not None and st.metadata_id == dur_id:
                            dur = st.uint64_value
                    key = (m.display_name or m.name, cat, src)
                    ops[key] = ops.get(key, 0) + dur
    out = [{"op": k[0], "type": k[1], "source": k[2], "self_us": v / 1e6}
           for k, v in ops.items()]
    # Control-flow rows (while/conditional) report INCLUSIVE durations in
    # the XLA-Ops line — their body ops are also listed individually, so
    # counting them in the total double-counts ~half the device time and
    # once misread a rollout profile as 51% "loop overhead". Drop them
    # from total/percentages; the body ops carry the real attribution.
    out = [o for o in out if o["type"] not in ("while", "conditional")]
    out.sort(key=lambda o: -o["self_us"])
    total = sum(o["self_us"] for o in out)
    cats = {}
    for o in out:
        cats[o["type"] or "other"] = (cats.get(o["type"] or "other", 0.0)
                                      + o["self_us"])
    print(json.dumps({
        "total_device_us_per_step": round(total / max(steps, 1), 1),
        "categories_pct": {k: round(100 * v / total, 1)
                           for k, v in sorted(cats.items(),
                                              key=lambda kv: -kv[1])},
        "top_ops": [{"op": o["op"][:70], "type": o["type"],
                     "src": o["source"].split("/")[-1],
                     "pct": round(100 * o["self_us"] / total, 1),
                     "us_per_step": round(o["self_us"] / max(steps, 1), 1)}
                    for o in out[:18]],
    }, indent=1))


def summarize(logdir, steps):
    xspaces = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    assert xspaces, f"no xplane under {logdir}"
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception:
        return _summarize_xspace_direct(xspaces, steps)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xspaces, "framework_op_stats^", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    import csv as _csv
    import io
    rows = list(_csv.reader(io.StringIO(data)))
    header = rows[0]
    idx = {name: i for i, name in enumerate(header)}
    ops = []
    for r in rows[1:]:
        if len(r) != len(header):
            continue
        try:
            ops.append({
                "op": r[idx.get("Operation", idx.get("operation", 1))],
                "type": r[idx.get("Type", idx.get("type", 0))],
                "self_us": float(r[idx["Total self-time (us)"]])
                if "Total self-time (us)" in idx else
                float(r[idx.get("total_self_time_us", 2)]),
                "avg_us": 0.0,
            })
        except (KeyError, ValueError, IndexError):
            continue
    ops.sort(key=lambda o: -o["self_us"])
    total = sum(o["self_us"] for o in ops)
    cats = {}
    for o in ops:
        t = o["type"].lower()
        if "fusion" in t:
            cat = "fusion(elementwise+)"
        elif any(k in t for k in ("dot", "conv", "einsum")):
            cat = "matmul"
        elif "custom" in t:
            cat = "custom-call(pallas)"
        elif any(k in t for k in ("copy", "transpose", "reshape", "bitcast")):
            cat = "data-movement"
        elif "reduce" in t:
            cat = "reduce"
        else:
            cat = "other"
        cats[cat] = cats.get(cat, 0.0) + o["self_us"]
    print(json.dumps({
        "total_device_us_per_step": round(total / max(steps, 1), 1),
        "categories_pct": {k: round(100 * v / total, 1)
                           for k, v in sorted(cats.items(),
                                              key=lambda kv: -kv[1])},
        "top_ops": [{"op": o["op"][:90], "type": o["type"],
                     "pct": round(100 * o["self_us"] / total, 1)}
                    for o in ops[:18]],
    }, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["multiphase", "cylinder"],
                    default="multiphase")
    ap.add_argument("--dtype",
                    choices=["f32", "bf16", "bf16_mixed", "bf16_shadow"],
                    default="f32")
    ap.add_argument("--impl", choices=["auto", "xla"], default="auto")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch size (bench_training.build)")
    ap.add_argument("--mu", choices=["f32", "bf16"], default="f32",
                    help="AdamW first-moment dtype")
    ap.add_argument("--opt", choices=["adamw", "adafactor"],
                    default="adamw",
                    help="optimizer family (TrainConfig.optimizer)")
    ap.add_argument("--logdir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    args = ap.parse_args()
    logdir = args.logdir or tempfile.mkdtemp(prefix="seatpu_prof_")
    capture(args.case, args.dtype, args.impl, args.steps, logdir,
            batch=args.batch,
            mu_dtype="bfloat16" if args.mu == "bf16" else "float32",
            optimizer=args.opt)
    summarize(logdir, args.steps)


if __name__ == "__main__":
    main()
