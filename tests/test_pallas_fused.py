"""Fused stem / depthwise Pallas kernels vs naive references, and their
integration into the deploy plan (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu import deploy
from shiftedscalequantization_tpu.graph import conv2d, max_pool
from shiftedscalequantization_tpu.ops.pallas.depthwise import dw_conv3x3_int8
from shiftedscalequantization_tpu.ops.pallas.stem import stem_fused
from shiftedscalequantization_tpu.quantize import act_flags


def naive_stem(x, w, scale, bias, delta, zp, qmax, coff):
    """conv 7x7/s2/p3 + scale/bias + relu + act quant + 3x3/s2/p1 maxpool
    on codes — the exact segment ops/pallas/stem.py fuses."""
    y = conv2d(x, w, None, (2, 2), (3, 3), 1,
               precision=jax.lax.Precision.HIGHEST)
    y = jnp.maximum(y * scale + bias, 0.0)
    q = jnp.clip(jnp.round(y / delta) + zp, 0, qmax) - coff
    q = q.astype(jnp.int8)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    return jax.lax.reduce_window(q, jnp.int8(-128), jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), pads)


class TestStemKernel:
    def _run(self, h, oc, coff_from_zp, seed=0):
        rng = np.random.default_rng(seed)
        b = 2
        x = jnp.asarray(rng.normal(size=(b, h, h, 3)).astype(np.float32))
        w = jnp.asarray(rng.integers(-120, 121, (oc, 3, 7, 7))
                        .astype(np.float32))
        scale = jnp.asarray(rng.uniform(0.001, 0.004, oc).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=oc).astype(np.float32) * 0.1)
        delta, zp, qmax = 0.02, 0.0, 255.0
        coff = zp if coff_from_zp else 128.0
        got = stem_fused(x, w, scale, bias, delta, zp, qmax, coff,
                         interpret=True)
        want = naive_stem(x, w, scale, bias, delta, zp, qmax, coff)
        return np.asarray(got), np.asarray(want)

    def test_matches_naive_biased(self):
        got, want = self._run(h=32, oc=8, coff_from_zp=False)
        assert got.shape == want.shape == (2, 8, 8, 8)
        # 2-pass bf16 hi/lo conv vs f32 HIGHEST: codes may flip by one
        # step at exact rounding boundaries only
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 2e-3, (diff != 0).mean()

    def test_matches_naive_centered_larger(self):
        got, want = self._run(h=64, oc=16, coff_from_zp=True, seed=3)
        assert got.shape == want.shape == (2, 16, 16, 16)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 2e-3


class TestDepthwiseKernel:
    def _data(self, b, h, c, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.integers(-8, 8, (b, h, h, c)), dtype=jnp.int8)
        w = jnp.asarray(rng.integers(-2, 2, (c, 3, 3)).astype(np.float32))
        scalef = jnp.asarray(rng.uniform(0.01, 0.1, c).astype(np.float32))
        biasf = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.2)
        return x, w, scalef, biasf

    def _naive(self, x, w, scalef, biasf, delta_o, zp_o, qmax, stride, act):
        xf = x.astype(jnp.float32)
        w_oihw = w.reshape(w.shape[0], 1, 3, 3)
        acc = conv2d(xf, w_oihw, None, (1, 1), (1, 1), w.shape[0],
                     precision=jax.lax.Precision.HIGHEST)
        y = acc * scalef + biasf
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        q = jnp.clip(jnp.round(y / delta_o) + zp_o, 0, qmax) - zp_o
        q = q.astype(jnp.int8)
        if stride != 1:
            q = q[:, ::stride, ::stride, :]
        return q

    def test_exact_int_semantics_relu6(self):
        x, w, scalef, biasf = self._data(2, 8, 16)
        delta_o, zp_o, qmax = 0.05, 7.0, 15.0
        got = dw_conv3x3_int8(x, w, scalef, biasf, delta_o, zp_o, qmax,
                              stride=1, act="relu6", interpret=True)
        want = self._naive(x, w, scalef, biasf, delta_o, zp_o, qmax, 1,
                           "relu6")
        # all-integer accumulation (|acc| << 2^24): bit-exact
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_stride2(self):
        x, w, scalef, biasf = self._data(1, 12, 8, seed=4)
        got = dw_conv3x3_int8(x, w, scalef, biasf, 0.1, 8.0, 15.0,
                              stride=2, act="relu", interpret=True)
        want = self._naive(x, w, scalef, biasf, 0.1, 8.0, 15.0, 2, "relu")
        assert got.shape == (1, 6, 6, 8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _build(arch, nbw, nba, hw):
    from shiftedscalequantization_tpu.models import resnet, zoo
    graph, _ = zoo.build(arch, num_classes=10)
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=nbw, n_bits_a=nba, w_scale_method="max",
                          a_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, hw, hw, 3))
    qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
    flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
    return graph, params, qstate, x, flags


class TestDeployIntegration:
    def test_resnet18_imagenet_stem_fused(self, monkeypatch):
        """ImageNet-variant ResNet-18: with SSQ_STEM_KERNEL=1 (opt-in; the
        XLA 2-pass float path measures faster on v5e) the plan picks the
        fused stem kernel and deploy still agrees with sim mode."""
        monkeypatch.setenv("SSQ_STEM_KERNEL", "1")
        graph, params, qstate, x, flags = _build("resnet18", 4, 4, 64)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps)
        assert plan["__fused_stem__"] is not None
        stem = plan["__fused_stem__"]
        assert plan[stem][0] == "stem_fused"
        sim = ssq.forward(graph, params, qstate, x, flags)
        dep = deploy.deploy_forward(graph, dparams, steps, x, plan=plan)
        sim, dep = np.asarray(sim), np.asarray(dep)
        assert (sim.argmax(-1) == dep.argmax(-1)).mean() >= 0.75
        rel = np.abs(sim - dep).mean() / (np.abs(sim).mean() + 1e-9)
        assert rel < 0.2, rel

    def test_deploy_forward_jits_with_fused_kernels(self, monkeypatch):
        """bench.py wraps deploy_forward in jit: act steps become tracers,
        so the fused-kernel paths must not concretize them."""
        monkeypatch.setenv("SSQ_STEM_KERNEL", "1")
        graph, params, qstate, x, flags = _build("resnet18", 4, 4, 64)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps)
        assert plan["__fused_stem__"] is not None
        eager = deploy.deploy_forward(graph, dparams, steps, x, plan=plan)
        jitted = jax.jit(lambda s, xi: deploy.deploy_forward(
            graph, dparams, s, xi, plan=plan))(steps, x)
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                                   rtol=1e-5, atol=1e-5)

    def test_stem_falls_back_on_nonsquare_input(self, monkeypatch):
        monkeypatch.setenv("SSQ_STEM_KERNEL", "1")
        graph, params, qstate, x, flags = _build("resnet18", 4, 4, 64)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps)
        xr = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 32, 3))
        out = deploy.deploy_forward(graph, dparams, steps, xr, plan=plan)
        assert out.shape == (2, 10)

    def test_mobilenetv2_dw_kernel_used(self, monkeypatch):
        """MobileNetV2 with SSQ_DW_KERNEL=1 (opt-in; the XLA bf16-codes
        path measures faster at batch 256 — BENCHMARKS.md): every 3x3
        depthwise unit with int8-fitting grids runs through the fused VPU
        kernel; deploy agrees with sim."""
        monkeypatch.setenv("SSQ_DW_KERNEL", "1")
        graph, params, qstate, x, flags = _build("mobilenetv2", 4, 4, 32)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps)
        dw_units = [k for k, v in plan.items()
                    if not k.startswith("__") and v[0] == "dw_int8"]
        assert len(dw_units) >= 10, dw_units
        sim = ssq.forward(graph, params, qstate, x, flags)
        dep = deploy.deploy_forward(graph, dparams, steps, x, plan=plan)
        sim, dep = np.asarray(sim), np.asarray(dep)
        assert (sim.argmax(-1) == dep.argmax(-1)).mean() >= 0.75
        rel = np.abs(sim - dep).mean() / (np.abs(sim).mean() + 1e-9)
        assert rel < 0.2, rel


class TestMBConvKernel:
    """Fused inverted-residual kernel (ops/pallas/mbconv.py): bit-exact vs
    the XLA floor-round block math it replaces. Measured SLOWER than XLA
    on v5e (Mosaic's thin-K matmul lowering pays full 128-pad tile cost
    where XLA runs partial tiles — BENCHMARKS.md), so it is not in the
    deploy plan; the kernel + this parity test document the attempt."""

    def _ref(self, x, we, wd, wp, Ae, Be, Ad, Bd, Ap, Bp, qp, H, W,
             has_expand, has_residual):
        import jax.numpy as jnp
        xf = x.astype(jnp.float32)
        hi_e, hi_d, r_s, lo_o, hi_o, _ = [float(v) for v in qp[0]]
        if has_expand:
            acc = jnp.einsum('bhwc,ce->bhwe', xf, we)
            q1 = jnp.clip(jnp.floor(acc * Ae + Be), 0, hi_e)
        else:
            q1 = xf
        q1p = jnp.pad(q1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        accd = sum(q1p[:, di:di + H, dj:dj + W, :] * wd[di * 3 + dj]
                   for di in range(3) for dj in range(3))
        q2 = jnp.clip(jnp.floor(accd * Ad + Bd), 0, hi_d)
        y = jnp.einsum('bhwe,eo->bhwo', q2, wp) * Ap + Bp
        if has_residual:
            y = y + xf * r_s
        return jnp.clip(jnp.floor(y), lo_o, hi_o).astype(jnp.int8)

    def test_exact_vs_reference_math(self):
        import jax.numpy as jnp
        from shiftedscalequantization_tpu.ops.pallas.mbconv import \
            mbconv_fused
        rng = np.random.default_rng(0)
        B, H, W, CI, CE, CO = 2, 16, 16, 8, 48, 8
        x = jnp.asarray(rng.integers(-8, 8, (B, H, W, CI)), jnp.int8)
        we = rng.integers(-2, 2, (CI, CE)).astype(np.float32)
        wd = rng.integers(-2, 2, (9, CE)).astype(np.float32)
        wp = rng.integers(-2, 2, (CE, CO)).astype(np.float32)
        Ae, Ad = (rng.uniform(0.01, 0.1, CE).astype(np.float32)
                  for _ in range(2))
        Ap = rng.uniform(0.01, 0.1, CO).astype(np.float32)
        Be, Bd = (rng.uniform(-1, 1, CE).astype(np.float32) + 0.5
                  for _ in range(2))
        Bp = rng.uniform(-1, 1, CO).astype(np.float32) + 0.5
        qp = jnp.asarray([[15.0, 15.0, 0.37, -8.0, 7.0, 0.0]], jnp.float32)
        out = mbconv_fused(x, jnp.asarray(we, jnp.bfloat16),
                           jnp.stack([Ae, Be]), jnp.asarray(wd),
                           jnp.stack([Ad, Bd]),
                           jnp.asarray(wp, jnp.bfloat16),
                           jnp.stack([Ap, Bp]), qp, True, True,
                           interpret=True)
        ref = self._ref(x, we, wd, wp, Ae, Be, Ad, Bd, Ap, Bp,
                        np.asarray(qp), H, W, True, True)
        assert bool(jnp.all(out == ref))

    def test_no_expand_no_residual(self):
        import jax.numpy as jnp
        from shiftedscalequantization_tpu.ops.pallas.mbconv import \
            mbconv_fused
        rng = np.random.default_rng(1)
        B, H, W, CE, CO = 2, 12, 12, 32, 16
        x = jnp.asarray(rng.integers(0, 8, (B, H, W, CE)), jnp.int8)
        wd = rng.integers(-2, 2, (9, CE)).astype(np.float32)
        wp = rng.integers(-2, 2, (CE, CO)).astype(np.float32)
        Ad = rng.uniform(0.01, 0.1, CE).astype(np.float32)
        Bd = rng.uniform(-1, 1, CE).astype(np.float32) + 0.5
        Ap = rng.uniform(0.01, 0.1, CO).astype(np.float32)
        Bp = rng.uniform(-1, 1, CO).astype(np.float32) + 0.5
        qp = jnp.asarray([[15.0, 15.0, 0.0, -8.0, 7.0, 0.0]], jnp.float32)
        out = mbconv_fused(x, jnp.zeros((CE, CE), jnp.bfloat16),
                           jnp.zeros((2, CE), jnp.float32),
                           jnp.asarray(wd), jnp.stack([Ad, Bd]),
                           jnp.asarray(wp, jnp.bfloat16),
                           jnp.stack([Ap, Bp]), qp, False, False,
                           interpret=True)
        ref = self._ref(x, None, wd, wp, None, None, Ad, Bd, Ap, Bp,
                        np.asarray(qp), H, W, False, False)
        assert bool(jnp.all(out == ref))
