"""Activation-aware quantization calibration.

The int4 serving quantizer (utils/precision.quantize_weights_int4) picks
per-output-channel scales by minimizing plain weight-space MSE. But the
error that matters downstream is in the layer's OUTPUT: for input x,
``err_n = sum_k x_k (w_kn - q_kn s_n)`` — weight deviations on input
channels with large typical |x_k| hurt more. The reference has no serving
quantization at all (torch f32 end to end), so this whole facility is
TPU-rebuild surface; the technique is standard post-training-quantization
practice (diagonal-Hessian-weighted rounding + bias correction, cf. Nagel
et al., "Data-Free Quantization", and the GPTQ line of work).

This module collects the two per-input-channel statistics that weighted
scale search and bias correction need:

- ``sq``:   E[x_k^2]  (the diagonal of the GPTQ Hessian X^T X / M)
- ``mean``: E[x_k]    (for folding the systematic output error into biases)

Capture works by a module-level hook in ops.layers.linear: inside
``capture_activation_stats()`` every *eager* (non-traced) linear call
accumulates stats keyed by the identity of its param dict; afterwards the
recorder resolves identities to tree paths on the SAME params object the
forward ran with. Run the forward un-jitted — traced calls are skipped by
design (tracers carry no data), so a jitted calibration pass would simply
record nothing.

Usage (serving calibration, e.g. tools/measure_bf16_drift.py --int4_scaling cal):

    params = fuse_attention_projections(params)   # calibrate the SERVING layout
    stats = calibrate_temporal(params, cfg, batches)
    qparams = quantize_weights_int4(params, act_stats=stats)
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from sea_tpu.ops import layers as _layers


class ActivationRecorder:
    """Accumulates per-input-channel moments for every 2-D linear reached
    by an eager forward pass. Keyed by param-dict identity until
    ``resolve(params)`` maps identities to tree paths."""

    def __init__(self):
        self._acc = {}   # id(param_dict) -> [count, sum_x, sum_x2]

    def record(self, params, x):
        w = params.get("w")
        if w is None or getattr(w, "ndim", 0) != 2:
            return
        if isinstance(x, jax.core.Tracer):
            return  # jitted call: nothing concrete to record
        x2 = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
        ent = self._acc.get(id(params))
        if ent is None:
            self._acc[id(params)] = [x2.shape[0], jnp.sum(x2, axis=0),
                                     jnp.sum(x2 * x2, axis=0)]
        else:
            ent[0] += x2.shape[0]
            ent[1] = ent[1] + jnp.sum(x2, axis=0)
            ent[2] = ent[2] + jnp.sum(x2 * x2, axis=0)

    def resolve(self, params):
        """Walk ``params`` (the object the forward ran with) and return
        ``{path: {"mean": [K], "sq": [K], "count": n}}`` for every linear
        param dict that was recorded. Paths are tuples of dict keys /
        sequence indices — the same address space utils.precision's
        quantizer walks use."""
        out = {}

        def walk(node, path):
            if isinstance(node, dict):
                ent = self._acc.get(id(node))
                if ent is not None:
                    n, sx, sxx = ent
                    out[path] = {"count": n,
                                 "mean": sx / n,
                                 "sq": sxx / n}
                for k, v in node.items():
                    walk(v, path + (k,))
            elif isinstance(node, (list, tuple)):
                for i, v in enumerate(node):
                    walk(v, path + (i,))

        walk(params, ())
        return out


@contextlib.contextmanager
def capture_activation_stats():
    """Context manager installing the recorder hook on ops.layers.linear.
    Yields the ActivationRecorder. Not reentrant (one capture at a time)."""
    if _layers._CALIBRATION is not None:
        raise RuntimeError("activation capture already active")
    rec = ActivationRecorder()
    _layers._CALIBRATION = rec
    try:
        yield rec
    finally:
        _layers._CALIBRATION = None


def calibrate_temporal(params, cfg, batches):
    """Collect activation stats for a TEMPORAL model over an iterable of
    ``(data, ib)`` teacher-forced batches (data [B,T,G,E], ib [B,T,ib]).
    Runs the forward eagerly (calibration is a handful of windows; eager
    CPU/TPU cost is negligible next to training). Returns the resolved
    ``{path: stats}`` dict for quantize_weights_*(act_stats=...)."""
    import dataclasses

    from sea_tpu.models.temporal import temporal_forward

    # The recorder needs EAGER per-field linear calls on the ORIGINAL
    # param dicts: the stacked-fields fast path (cfg.stack_fields) runs
    # them under jax.vmap on jnp.stack'd copies — traced AND
    # identity-unresolvable — so calibrate on the equivalent unstacked
    # trace (identical numerics, equality-tested).
    cfg = dataclasses.replace(cfg, stack_fields=False)
    with capture_activation_stats() as rec:
        for data, ib in batches:
            temporal_forward(params, cfg, jnp.asarray(data),
                             jnp.asarray(ib))
    return rec.resolve(params)
