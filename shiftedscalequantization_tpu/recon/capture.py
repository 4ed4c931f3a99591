"""Calibration activation capture.

Replaces the reference's two capture mechanisms — hook-based
save_inp_oup_data (quant/data_utils.py:8-37) and in-module feature caching
(quant_layer.py:245-279 + the per-layer 'if'/'of' passes in
ShiftedScaleQuant.py:243-255) — with two jitted interpreter passes:

  * inputs captured under ``inp_flags`` (typically: already-reconstructed
    prefix weight-quantized — BRECQ's asymmetric reconstruction, the running
    use_weight_quant state in the reference driver)
  * target outputs captured under ``out_flags`` (typically all-FP:
    set_quant_state(False, False))

Both passes stop at the captured node (the reference's
StopForwardException early exit). Batched over the calibration set; results
stay on device (optionally bf16 to halve cache HBM).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import Flags, Graph, forward


def _padded_batches(data, bs: int):
    """Yield ``(xb, n_valid)`` fixed-size batches covering ALL rows of data.

    The reference capture consumes every calibration sample
    (save_inp_oup_data iterates the whole cali tensor, data_utils.py:24-27);
    plain floor division here silently dropped ``n % bs`` samples. The final
    partial batch is zero-padded up to ``bs`` so the jitted capture graph
    keeps one compiled shape; callers trim outputs to ``n_valid`` rows.
    """
    n = data.shape[0]
    n_full, rem = divmod(n, bs)
    for i in range(n_full):
        yield data[i * bs:(i + 1) * bs], bs
    if rem:
        part = data[n_full * bs:]
        pad = jnp.zeros((bs - rem,) + tuple(part.shape[1:]), part.dtype)
        yield jnp.concatenate([part, pad], axis=0), rem


def capture_io(graph: Graph, params, qstate, target: str, cali_data,
               inp_flags: Flags, out_flags: Flags, batch_size: int = 64,
               cache_dtype=None):
    """Return (cached_inp, cached_out) for ``target`` over ``cali_data``.

    cali_data: (N, H, W, C) on host or device. Runs ceil(N/batch) jitted
    capture passes per flag set and concatenates.
    """

    @partial(jax.jit, static_argnames=("flags",))
    def cap(p, qs, xb, flags):
        return forward(graph, p, qs, xb, flags, capture=target)

    def run(flags, want_input):
        outs = []
        for xb, n_valid in _padded_batches(cali_data, batch_size):
            cin, cout = cap(params, qstate, xb, flags)
            t = (cin if want_input else cout)[:n_valid]
            if cache_dtype is not None:
                t = t.astype(cache_dtype)
            outs.append(t)
        return jnp.concatenate(outs, axis=0)

    cached_inp = run(inp_flags, want_input=True)
    cached_out = run(out_flags, want_input=False)
    return cached_inp, cached_out


class CaptureSession:
    """Single-compilation capture for the sequential recon pipeline.

    The per-layer asym capture normally compiles a fresh forward per
    quantized-prefix — and hardened quantizers change the qstate pytree
    structure after every reconstructed layer, so ≈2N distinct graphs for
    N layers (~30 remote compiles for ResNet-18 on a tunneled TPU).

    This session compiles ONE graph: a plain forward whose WEIGHTS are an
    input pytree with multi-node capture. Per layer, the quantized prefix
    is expressed as data — each done unit's weight is replaced by its
    materialized fake-quant tensor (w_hat = wq(w), computed eagerly once
    per unit per layer, negligible next to the forward) — so any mix of
    quantizer types / hardening states reuses the same executable.
    Numerics are identical to capture_io with weight-only prefix flags.
    """

    def __init__(self, graph: Graph, params, cali_data, targets,
                 batch_size: int = 64, output_affine: bool = False,
                 fp_cache_limit_bytes: int = 4 << 30):
        from ..graph import forward_multi_capture, iter_units
        self.graph = graph
        self.params = params
        self.cali = cali_data
        self.batch_size = batch_size
        self.output_affine = output_affine
        self.unit_names = [u.name for u in iter_units(graph)]
        targets = tuple(targets)
        self.targets = targets
        dummy_qstate = {n: None for n in self.unit_names}

        def run(p, xb):
            return forward_multi_capture(graph, p, dummy_qstate, xb, {},
                                         targets, Flags())

        self._fn = jax.jit(run)
        # FP target outputs are prefix-independent: cache them from ONE
        # pass over the calibration set instead of re-running the FP
        # forward for every layer — unless the cache would be too big
        self._fp_outs = None
        self._fp_cache_limit = fp_cache_limit_bytes

    def _sub_params(self, qstate, prefix_units):
        """params with prefix units' weights replaced by materialized
        fake-quant tensors; the gamma^z/phi^z output affine of prefix
        units (when enabled) folds into weights and bias:
        conv(x, w)*a + b*a + beta == (conv(x, w*a) + b') with b' = b*a+beta."""
        from ..ops.wquant import apply_weight_quant
        out = dict(self.params)
        for u in prefix_units:
            if u in out and qstate.get(u) is not None:
                uq = qstate[u]
                p = dict(out[u])
                w_hat = apply_weight_quant(uq.wq, p["w"])
                if self.output_affine and uq.alpha_out is not None:
                    a = uq.alpha_out.reshape((-1,) + (1,) * (w_hat.ndim - 1))
                    w_hat = w_hat * a
                    b = p.get("b")
                    b = 0.0 if b is None else b
                    p["b"] = b * uq.alpha_out + uq.beta_out
                p["w"] = w_hat
                out[u] = p
        return out

    def _ensure_fp_cache(self):
        if self._fp_outs is not None:
            return self._fp_outs is not False
        n = self.cali.shape[0]
        probe = self._fn(self.params, self.cali[:1])
        total = sum(v[1].size for v in probe.values()) * n * 4  # f32 bytes
        if total > self._fp_cache_limit:
            self._fp_outs = False
            return False
        outs = {t: [] for t in self.targets}
        for xb, n_valid in _padded_batches(self.cali, self.batch_size):
            res = self._fn(self.params, xb)
            for t in self.targets:
                outs[t].append(res[t][1][:n_valid])  # f32: capture_io parity
        self._fp_outs = {t: jnp.concatenate(v) for t, v in outs.items()}
        return True

    def capture(self, qstate, target: str, prefix_units, cache_dtype=None):
        """(cached_inp under quantized prefix, cached_out all-FP)."""
        p_prefix = self._sub_params(qstate, frozenset(prefix_units))
        have_fp = self._ensure_fp_cache()
        inps, outs = [], []
        for xb, n_valid in _padded_batches(self.cali, self.batch_size):
            cin = self._fn(p_prefix, xb)[target][0][:n_valid]
            if cache_dtype is not None:
                cin = cin.astype(cache_dtype)
            inps.append(cin)
            if not have_fp:
                cout = self._fn(self.params, xb)[target][1][:n_valid]
                outs.append(cout.astype(cache_dtype)
                            if cache_dtype is not None else cout)
        cached_out = self._fp_outs[target] if have_fp \
            else jnp.concatenate(outs)
        if cache_dtype is not None:
            cached_out = cached_out.astype(cache_dtype)
        return jnp.concatenate(inps), cached_out


def capture_grads(graph: Graph, params, qstate, target: str, cali_data,
                  batch_size: int = 32, act_quant: bool = False,
                  damping: float = 1.0):
    """Fisher-information proxy: |d KL(quant || fp) / d target_output| + 1.

    Reimplements save_grad_data + GetLayerGrad (reference
    data_utils.py:40-71,155-192): the network is quantized up to and
    including ``target`` (quantize_model_till), the KL divergence between
    its softmax output and the FP model's is differentiated w.r.t. the
    target node's output activation — here via jax.grad through an
    output-injected forward instead of a backward hook (works for targets
    nested inside blocks too).
    """
    from ..graph import Flags, forward, forward_inject, prefix_flags_till
    qflags = prefix_flags_till(graph, target, act_quant=act_quant)

    @jax.jit
    def grad_batch(params, qstate, xb):
        fp_out = forward(graph, params, qstate, xb, Flags())
        p_fp = jax.nn.softmax(fp_out, axis=1)
        _, t = forward(graph, params, qstate, xb, qflags, capture=target)

        def kl_from_t(t):
            out_q = forward_inject(graph, params, qstate, xb, target, t,
                                   qflags)
            logq = jax.nn.log_softmax(out_q, axis=1)
            # F.kl_div(log_softmax(q), softmax(fp), 'batchmean')
            logp = jnp.log(jnp.clip(p_fp, 1e-12))
            return (p_fp * (logp - logq)).sum() / xb.shape[0]

        return jax.grad(kl_from_t)(t)

    outs = []
    for xb, n_valid in _padded_batches(cali_data, batch_size):
        outs.append(grad_batch(params, qstate, xb)[:n_valid])
    grads = jnp.concatenate(outs, axis=0)
    return jnp.abs(grads) + damping
