"""Numerics parity vs the reference PyTorch implementation (oracle tests).

Runs the actual reference code (mounted read-only at /root/reference) on
the same inputs as our JAX implementation and compares tensors — the
golden-tensor budget from SURVEY.md §7 "Hard parts". Skipped when the
reference tree is absent (the framework itself never depends on it).
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

import jax
import jax.numpy as jnp

from shiftedscalequantization_tpu import fold_bn as my_fold
from shiftedscalequantization_tpu.ops import quant as Q
from shiftedscalequantization_tpu.ops import wquant as W


@pytest.fixture(scope="module")
def ref():
    """Import the reference with stubs for its missing deps."""
    ic_mod = types.ModuleType("icecream")

    class _IC:
        def configureOutput(self, **k): pass
        def disable(self): pass
        def __call__(self, *a, **k): return a

    ic_mod.ic = _IC()
    sys.modules.setdefault("icecream", ic_mod)
    import torch.nn as nn
    names = ["pretrained", "pretrained.PyTorch_CIFAR10",
             "pretrained.PyTorch_CIFAR10.cifar10_models"]
    for n in names:
        sys.modules.setdefault(n, types.ModuleType(n))
    leaf = types.ModuleType("pretrained.PyTorch_CIFAR10.cifar10_models.resnet")

    class BasicBlockCIFAR(nn.Module):
        pass

    leaf.BasicBlockCIFAR = BasicBlockCIFAR
    sys.modules.setdefault(
        "pretrained.PyTorch_CIFAR10.cifar10_models.resnet", leaf)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from quant.adaptive_rounding import AdaRoundQuantizer
    from quant.channelQuant import ChannelQuant
    from quant.channelQuantMSE import ChannelQuantMSE
    from quant.fold_bn import fold_bn_into_conv
    from quant.quant_layer import UniformAffineQuantizer
    return types.SimpleNamespace(
        torch=torch, UAQ=UniformAffineQuantizer, Ada=AdaRoundQuantizer,
        CQ=ChannelQuant, CQM=ChannelQuantMSE, fold=fold_bn_into_conv)


@pytest.fixture(scope="module")
def wdata():
    rng = np.random.default_rng(42)
    return {
        "conv": rng.normal(size=(8, 6, 3, 3)).astype(np.float32) * 0.3,
        "fc": rng.normal(size=(10, 16)).astype(np.float32) * 0.2,
    }


class TestScaleInitParity:
    @pytest.mark.parametrize("method", ["mse", "max"])
    def test_per_channel_weight_init(self, ref, wdata, method):
        torch = ref.torch
        w = wdata["conv"]
        q = ref.UAQ(n_bits=4, symmetric=False, channel_wise=True,
                    scale_method=method, ch=w.shape)
        ref_out = q(torch.tensor(w)).detach().numpy()
        ref_delta = q.delta.detach().numpy().reshape(-1)
        ref_zp = q.zero_point.detach().numpy().reshape(-1)

        qp, _ = Q.init_weight_qparams(jnp.asarray(w.reshape(8, -1)), 4,
                                      False, True, scale_method=method)
        np.testing.assert_allclose(np.asarray(qp.delta).reshape(-1),
                                   ref_delta, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(qp.zero_point).reshape(-1),
                                   ref_zp)
        mine = W.UniformWQ(qp=qp)(jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(mine), ref_out, atol=1e-6)


class TestAdaRoundParity:
    def test_alpha_init_and_soft_forward(self, ref, wdata):
        torch = ref.torch
        w = wdata["conv"]
        uaq = ref.UAQ(n_bits=4, symmetric=False, channel_wise=True,
                      scale_method="max", ch=w.shape)
        _ = uaq(torch.tensor(w))  # lazy init
        ada = ref.Ada(uaq=uaq, weight_tensor=torch.tensor(w),
                      round_mode='learned_hard_sigmoid')
        ada.soft_targets = True
        ref_alpha = ada.alpha.detach().numpy()
        ref_out = ada(torch.tensor(w)).detach().numpy()

        qp, _ = Q.init_weight_qparams(jnp.asarray(w.reshape(8, -1)), 4,
                                      False, True, scale_method="max")
        mine = W.init_adaround(qp, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(mine.alpha), ref_alpha,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(mine(jnp.asarray(w))), ref_out,
                                   atol=1e-5)

    def test_hard_forward(self, ref, wdata):
        torch = ref.torch
        w = wdata["fc"]
        uaq = ref.UAQ(n_bits=4, symmetric=False, channel_wise=True,
                      scale_method="max", ch=w.shape)
        _ = uaq(torch.tensor(w))
        ada = ref.Ada(uaq=uaq, weight_tensor=torch.tensor(w),
                      round_mode='learned_hard_sigmoid')
        ada.soft_targets = False
        ref_out = ada(torch.tensor(w)).detach().numpy()
        qp, _ = Q.init_weight_qparams(jnp.asarray(w.reshape(10, -1)), 4,
                                      False, True, scale_method="max")
        import dataclasses
        mine = dataclasses.replace(W.init_adaround(qp, jnp.asarray(w)),
                                   soft=False)
        np.testing.assert_allclose(np.asarray(mine(jnp.asarray(w))), ref_out,
                                   atol=1e-6)


def _ref_channelquant(ref, w_np, shift_targets, n_bits=4):
    torch = ref.torch
    uaq = ref.UAQ(n_bits=n_bits, symmetric=False, channel_wise=True,
                  scale_method="max", ch=w_np.shape)
    _ = uaq(torch.tensor(w_np))
    cq = ref.CQ(1.0, uaq, torch.tensor(w_np), shiftTarget=list(shift_targets),
                name="t")
    cq.init_v_beta(torch.tensor(w_np))
    cq.opt_mode = "adaShift"
    return uaq, cq


def _my_shifted(w_np, shift_targets, n_bits=4):
    oc = w_np.shape[0]
    qp, _ = Q.init_weight_qparams(jnp.asarray(w_np.reshape(oc, -1)), n_bits,
                                  False, True, scale_method="max")
    return W.init_shifted_scale(qp, jnp.asarray(w_np), tuple(shift_targets))


class TestShiftedScaleParity:
    """The paper's core quantizer vs the reference, conv + fc."""

    @pytest.mark.parametrize("kind", ["conv", "fc"])
    def test_init_v_beta(self, ref, wdata, kind):
        w = wdata[kind]
        sts = (1 - 1 / 32, 1 + 1 / 32, 1.0)
        _, cq = _ref_channelquant(ref, w, sts)
        mine = _my_shifted(w, sts)
        # candidate floor codes
        ref_xq = np.stack([t.numpy() for t in cq.x_q])
        np.testing.assert_allclose(np.asarray(mine.x_q), ref_xq, atol=1e-5)
        # alpha init (MSE argmin -> inverse softmax)
        np.testing.assert_allclose(np.asarray(mine.alpha),
                                   cq.alpha.detach().numpy(),
                                   rtol=1e-4, atol=1e-4)
        # beta init s.t. sigmoid(beta)=rest of effective delta
        np.testing.assert_allclose(np.asarray(mine.beta),
                                   cq.beta.detach().numpy(),
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("kind", ["conv", "fc"])
    def test_adashift_soft_and_hard_forward(self, ref, wdata, kind):
        import dataclasses
        torch = ref.torch
        w = wdata[kind]
        sts = (1 - 1 / 32, 1 + 1 / 32, 1.0)
        _, cq = _ref_channelquant(ref, w, sts)
        mine = _my_shifted(w, sts)
        ref_soft = cq(torch.tensor(w)).detach().numpy()
        np.testing.assert_allclose(np.asarray(mine(jnp.asarray(w))),
                                   ref_soft, atol=1e-5)
        cq.hard_round = True
        cq.hard_targets = True
        ref_hard = cq(torch.tensor(w)).detach().numpy()
        mine_h = dataclasses.replace(mine, hard_targets=True, hard_round=True)
        np.testing.assert_allclose(np.asarray(mine_h(jnp.asarray(w))),
                                   ref_hard, atol=1e-5)

    def test_effective_delta_matches_get_delta(self, ref, wdata):
        torch = ref.torch
        w = wdata["conv"]
        sts = (0.5, 1.0)
        _, cq = _ref_channelquant(ref, w, sts)
        mine = _my_shifted(w, sts)
        ref_delta = cq.get_delta().detach().numpy()
        got = np.asarray(mine.effective_delta(jnp.asarray(w)))
        np.testing.assert_allclose(np.broadcast_to(got, (8, 6, 1, 1)),
                                   np.broadcast_to(ref_delta, (8, 6, 1, 1)),
                                   rtol=1e-5)


class TestChannelQuantMSEParity:
    def test_init_scale_and_forward(self, ref, wdata):
        torch = ref.torch
        w = wdata["conv"]
        uaq = ref.UAQ(n_bits=4, symmetric=False, channel_wise=True,
                      scale_method="max", ch=w.shape)
        _ = uaq(torch.tensor(w))
        cqm = ref.CQM(1.0, uaq, torch.tensor(w), level=4, threshold=1.0)
        cqm.init_scale(torch.tensor(w))
        ref_scale = cqm.inp_scale.detach().numpy()
        ref_out = cqm(torch.tensor(w)).detach().numpy()

        oc = w.shape[0]
        qp, raw_zp = Q.init_weight_qparams(jnp.asarray(w.reshape(oc, -1)), 4,
                                           False, True, scale_method="max")
        mine = W.init_inp_scale(qp, raw_zp, jnp.asarray(w), level=4,
                                threshold=1.0)
        np.testing.assert_allclose(np.asarray(mine.inp_scale), ref_scale,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(mine(jnp.asarray(w))), ref_out,
                                   atol=1e-5)


class TestFoldBNParity:
    def test_conv_bn_fold(self, ref):
        torch = ref.torch
        torch.manual_seed(0)
        conv = torch.nn.Conv2d(6, 8, 3, bias=True)
        bn = torch.nn.BatchNorm2d(8)
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.normal_()
        w0 = conv.weight.detach().numpy().copy()
        b0 = conv.bias.detach().numpy().copy()
        p = {"w": jnp.asarray(w0), "b": jnp.asarray(b0),
             "bn": {"gamma": jnp.asarray(bn.weight.detach().numpy()),
                    "beta": jnp.asarray(bn.bias.detach().numpy()),
                    "mean": jnp.asarray(bn.running_mean.numpy()),
                    "var": jnp.asarray(bn.running_var.numpy())}}
        ref.fold(conv, bn)
        folded = my_fold.fold_unit(p, eps=bn.eps)
        np.testing.assert_allclose(np.asarray(folded["w"]),
                                   conv.weight.detach().numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(folded["b"]),
                                   conv.bias.detach().numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestLossParity:
    def test_fused_loss_and_grad(self, ref, wdata):
        """Same batch + same init -> the fused loss value AND dL/dalpha must
        match torch autograd (layer_recon_fused_shiftedScale.py:223-309)."""
        torch = ref.torch
        w = wdata["fc"]
        sts = (1 - 1 / 32, 1 + 1 / 32, 1.0)
        _, cq = _ref_channelquant(ref, w, sts)
        mine = _my_shifted(w, sts)
        rng = np.random.default_rng(7)
        xb = rng.normal(size=(16, 16)).astype(np.float32)
        yb = rng.normal(size=(16, 10)).astype(np.float32)
        step, iters, lmda_r, lmda_s, p_norm = 5000.0, 20000, 0.01, 0.1, 1.0

        # torch side
        tw = torch.tensor(w)
        xq = cq(tw)
        pred = torch.tensor(xb) @ xq.t()
        rec = (pred - torch.tensor(yb)).abs().pow(p_norm).sum(1).mean()
        from quant.layer_recon_fused_shiftedScale import \
            FusedLinearTempDecayShift
        b = FusedLinearTempDecayShift(iters, 0.2, 20, 2)(step)
        b2 = FusedLinearTempDecayShift(iters * 3 / 4, 0.2, 20, 2)(step)
        rvals = cq.get_soft_round()
        svals = cq.get_sig_soft_targets()
        loss_t = rec + lmda_r * (1 - ((rvals - .5).abs() * 2).pow(b)).sum() \
            + lmda_s * (1 - ((svals - .5).abs() * 2).pow(b2)).sum()
        loss_t.backward()
        ref_grad = cq.alpha.grad.detach().numpy()

        # jax side
        def loss_fn(alpha):
            import dataclasses
            wq = dataclasses.replace(mine, alpha=alpha)
            xqj = wq(jnp.asarray(w))
            predj = jnp.asarray(xb) @ xqj.T
            recj = (jnp.abs(predj - jnp.asarray(yb)) ** p_norm).sum(1).mean()
            bj = Q.linear_temp_decay(step, iters, 0.2, 20, 2)
            b2j = Q.linear_temp_decay(step, iters * 3 / 4, 0.2, 20, 2)
            r = Q.round_regularizer(Q.rectified_sigmoid(wq.beta), bj)
            sreg = Q.round_regularizer(wq.soft_targets(), b2j)
            return recj + lmda_r * r + lmda_s * sreg

        loss_j, grad_j = jax.value_and_grad(loss_fn)(mine.alpha)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(grad_j), ref_grad,
                                   rtol=1e-3, atol=1e-5)


class TestTwoPhaseParity:
    """Two-phase stack parity: init_v (dequant candidates), the
    'learned_hard_sigmoid' forward, update_delta + init_beta + 'adaround'."""

    @pytest.mark.parametrize("kind", ["conv", "fc"])
    def test_init_v_and_lhs_forward(self, ref, wdata, kind):
        import dataclasses
        torch = ref.torch
        w = wdata[kind]
        sts = (0.5, 1.0)
        uaq = ref.UAQ(n_bits=4, symmetric=False, channel_wise=True,
                      scale_method="max", ch=w.shape)
        _ = uaq(torch.tensor(w))
        cq = ref.CQ(1.0, uaq, torch.tensor(w), shiftTarget=list(sts))
        cq.init_v(torch.tensor(w))   # dequant candidates + alpha + mode lhs
        ref_soft = cq(torch.tensor(w)).detach().numpy()

        oc = w.shape[0]
        qp, _ = Q.init_weight_qparams(jnp.asarray(w.reshape(oc, -1)), 4,
                                      False, True, scale_method="max")
        mine = W.init_shifted_scale_twophase(qp, jnp.asarray(w), sts)
        ref_xq = np.stack([t.numpy() for t in cq.x_q])
        np.testing.assert_allclose(np.asarray(mine.x_q), ref_xq, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mine(jnp.asarray(w))),
                                   ref_soft, atol=1e-5)
        # hard targets
        cq.hard_targets = True
        ref_hard = cq(torch.tensor(w)).detach().numpy()
        mine_h = dataclasses.replace(mine, hard_targets=True)
        np.testing.assert_allclose(np.asarray(mine_h(jnp.asarray(w))),
                                   ref_hard, atol=1e-5)

    def test_update_delta_init_beta_adaround_forward(self, ref, wdata):
        """bake_shift_to_adaround vs the reference's update_delta +
        init_beta + opt_mode='adaround' forward (channelQuant.py:65-78,
        296-307)."""
        import dataclasses
        torch = ref.torch
        w = wdata["conv"]
        sts = (0.5, 1.0)
        uaq = ref.UAQ(n_bits=4, symmetric=False, channel_wise=True,
                      scale_method="max", ch=w.shape)
        _ = uaq(torch.tensor(w))
        cq = ref.CQ(1.0, uaq, torch.tensor(w), shiftTarget=list(sts))
        cq.init_v(torch.tensor(w))
        cq.hard_targets = True
        cq.update_delta()            # delta <- per-(oc,ic) effective
        cq.init_beta(torch.tensor(w))
        cq.opt_mode = "adaround"
        ref_soft = cq(torch.tensor(w)).detach().numpy()
        cq.hard_round = True
        ref_hard = cq(torch.tensor(w)).detach().numpy()

        oc = w.shape[0]
        qp, _ = Q.init_weight_qparams(jnp.asarray(w.reshape(oc, -1)), 4,
                                      False, True, scale_method="max")
        ss = W.init_shifted_scale_twophase(qp, jnp.asarray(w), sts)
        ss = dataclasses.replace(ss, hard_targets=True)
        ada = W.bake_shift_to_adaround(ss, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(ada.alpha),
                                   cq.beta.detach().numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(ada(jnp.asarray(w))),
                                   ref_soft, atol=1e-5)
        ada_h = dataclasses.replace(ada, soft=False)
        np.testing.assert_allclose(np.asarray(ada_h(jnp.asarray(w))),
                                   ref_hard, atol=1e-5)

    def test_recon_trajectory_golden(self, ref, wdata):
        """End-to-end optimizer-trajectory parity: N Adam steps of the
        reference's block_recon_fused_shiftedScale
        (layer_recon_fused_shiftedScale.py:23-141) vs engine.reconstruct_node
        on identical cached tensors — loss curve, soft->hard flip losses,
        and hardened shift selections must all agree (the round-1 review's
        missing item 3).

        The calibration cache holds exactly batch_size samples, so both
        sides' random permutation selects the identical full batch every
        step — the trajectories are then deterministic and comparable
        despite different RNGs (loss is permutation-invariant).
        """
        import dataclasses

        torch = ref.torch
        sys.path.insert(0, REF)
        from models.resnet import BasicBlock
        from quant.fold_bn import search_fold_and_remove_bn
        from quant.quant_block import QuantBasicBlock
        import quant.layer_recon_fused_shiftedScale as ref_recon

        iters, bs, sts = 100, 32, (1 - 1 / 32, 1 + 1 / 32, 1.0)
        lmda = [0.01, 0.1]
        rng = np.random.default_rng(11)

        # --- torch side: folded BasicBlock 8->8, fixed weights/BN ----------
        torch.manual_seed(0)
        # reference BasicBlock's default norm_layer is a module global the
        # ResNet ctor sets (models/resnet.py:129) — pass it explicitly
        blk = BasicBlock(8, 8, norm_layer=torch.nn.BatchNorm2d)
        with torch.no_grad():
            for conv in (blk.conv1, blk.conv2):
                conv.weight.copy_(torch.tensor(
                    rng.normal(size=(8, 8, 3, 3)).astype(np.float32) * 0.3))
            for bn in (blk.bn1, blk.bn2):
                bn.running_mean.copy_(torch.tensor(
                    rng.normal(size=8).astype(np.float32) * 0.1))
                bn.running_var.copy_(torch.tensor(
                    rng.uniform(0.5, 2.0, size=8).astype(np.float32)))
                bn.weight.copy_(torch.tensor(
                    rng.uniform(0.5, 1.5, size=8).astype(np.float32)))
                bn.bias.copy_(torch.tensor(
                    rng.normal(size=8).astype(np.float32) * 0.1))
        search_fold_and_remove_bn(blk)
        qblk = QuantBasicBlock(blk, dict(n_bits=4, channel_wise=True,
                                         scale_method="max"),
                               dict(n_bits=8, leaf_param=True))
        inp = torch.tensor(rng.normal(size=(bs, 8, 8, 8)).astype(np.float32))
        qblk.set_quant_state(False, False)
        with torch.no_grad():
            out_fp = qblk(inp)
        qblk.set_quant_state(True, False)
        with torch.no_grad():
            _ = qblk(inp)                       # lazy UAQ scale init
        for qm in (qblk.conv1, qblk.conv2):     # driver's quantizer swap
            qm.weight_quantizer = ref.CQ(1.0, qm.weight_quantizer,
                                         qm.org_weight.data,
                                         shiftTarget=list(sts))
        qblk.cached_inp_features = [inp]
        qblk.cached_out_features = [out_fp]

        traj_ref = []
        orig_loss = ref_recon.FusedScaleLossFunction

        class RecLoss(orig_loss):
            def __call__(self, pred, tgt, grad=None):
                out = super().__call__(pred, tgt, grad)
                traj_ref.append(self.rec_loss)
                return out

        ref_recon.FusedScaleLossFunction = RecLoss
        try:
            soft_hard = ref_recon.block_recon_fused_shiftedScale(
                qblk, iters=iters, lmda=lmda, model=qblk)
        finally:
            ref_recon.FusedScaleLossFunction = orig_loss

        # --- jax side: same graph, params, cache ---------------------------
        from shiftedscalequantization_tpu.graph import BlockSpec, UnitSpec, \
            UnitQuant
        from shiftedscalequantization_tpu.recon import ReconSettings, \
            reconstruct_node

        units = (
            UnitSpec("b.conv1", "conv", 8, 8, kernel=(3, 3), padding=(1, 1),
                     activation="relu"),
            UnitSpec("b.conv2", "conv", 8, 8, kernel=(3, 3), padding=(1, 1),
                     disable_act_quant=True),
        )
        graph = (BlockSpec("b", units=units, downsample=None, residual=True,
                           post_activation="relu"),)
        params, qstate = {}, {}
        for uname, qm in (("b.conv1", qblk.conv1), ("b.conv2", qblk.conv2)):
            w = qm.org_weight.data.numpy()
            b = qm.org_bias.data.numpy()
            params[uname] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
            qp, raw_zp = Q.init_weight_qparams(
                jnp.asarray(w.reshape(8, -1)), 4, False, True,
                scale_method="max")
            qstate[uname] = UnitQuant(wq=W.UniformWQ(qp=qp), aq=None,
                                      alpha_out=jnp.ones(8),
                                      beta_out=jnp.zeros(8), raw_zp=raw_zp)
        cin = jnp.asarray(inp.numpy().transpose(0, 2, 3, 1))      # NHWC
        cout = jnp.asarray(out_fp.numpy().transpose(0, 2, 3, 1))
        s = ReconSettings(mode="fused", iters=iters, batch_size=bs,
                          lmda_r=lmda[0], lmda_s=lmda[1],
                          shift_targets=sts,
                          # reference-faithful: beta is NOT in opt_params
                          # (layer_recon_fused_shiftedScale.py:65-66)
                          opt_beta=False)
        qs2, metrics = reconstruct_node(graph, params, qstate, "b", cin,
                                        cout, s, jax.random.PRNGKey(3))

        # loss curves agree step for step (f32 drift tolerance)
        mine = np.asarray(metrics["rec_trace"])
        theirs = np.asarray(traj_ref[:iters])
        np.testing.assert_allclose(mine, theirs, rtol=2e-2, atol=1e-4)
        # early steps are near-exact (drift hasn't accumulated)
        np.testing.assert_allclose(mine[:10], theirs[:10], rtol=1e-4)
        # soft/hard flip losses (reference rec_loss_out = [soft, hard])
        np.testing.assert_allclose(float(metrics["soft_loss"]), soft_hard[0],
                                   rtol=2e-2)
        np.testing.assert_allclose(float(metrics["hard_loss"]), soft_hard[1],
                                   rtol=2e-2)
        # hardened selections agree
        for uname, qm in (("b.conv1", qblk.conv1), ("b.conv2", qblk.conv2)):
            sel_ref = qm.weight_quantizer.get_sig_soft_targets() \
                .detach().numpy().argmax(-1)
            sel_my = np.asarray(
                jnp.argmax(qs2[uname].wq.soft_targets(), axis=-1))
            agree = (sel_ref == sel_my).mean()
            assert agree >= 0.98, f"{uname}: selection agreement {agree}"

    def test_none_mode_forward(self, ref, wdata):
        """ChannelQuant opt_mode='none' (plain round at delta*shiftedScale,
        channelQuant.py:79-94) equals UniformWQ at the base delta."""
        torch = ref.torch
        w = wdata["fc"]
        uaq = ref.UAQ(n_bits=4, symmetric=False, channel_wise=True,
                      scale_method="max", ch=w.shape)
        _ = uaq(torch.tensor(w))
        cq = ref.CQ(1.0, uaq, torch.tensor(w), shiftTarget=[1.0])
        cq.opt_mode = "none"
        ref_out = cq(torch.tensor(w)).detach().numpy()
        oc = w.shape[0]
        qp, _ = Q.init_weight_qparams(jnp.asarray(w.reshape(oc, -1)), 4,
                                      False, True, scale_method="max")
        mine = W.UniformWQ(qp=qp)(jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(mine), ref_out, atol=1e-6)
