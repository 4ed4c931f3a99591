"""On-device FP training: produces genuinely trained raw params for PTQ.

The reference consumes pretrained torchvision/BRECQ checkpoints
(trash/hubconf.py:16-68); none exist in this environment, so the accuracy
story (ACCURACY.md) trains its own FP models on the TPU and then runs the
full quantization pipeline on the result. This module is deliberately
minimal — SGD + momentum + cosine schedule, batch-stats BatchNorm — and
TPU-shaped: the whole inner loop is one jitted ``lax.scan`` chunk (one
dispatch per ``chunk`` steps; per-step dispatch would pay ~3.5 ms RTT on
the tunneled chip), with synth10 data rendered on device inside the scan.

Training uses the same graph IR and raw-param schema as the PTQ pipeline
({'w', 'bn': {gamma, beta, mean, var}} per unit, models/resnet.py:100-117),
so a trained model flows into prepare_model/fold_bn unchanged.
"""
from __future__ import annotations

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .fold_bn import BN_EPS
from .graph import BlockSpec, Graph, OpSpec, UnitSpec, _activation, conv2d, \
    global_avg_pool, linear, max_pool

BN_MOMENTUM = 0.1    # torch default: running = (1-m)*running + m*batch


# ---------------------------------------------------------------------------
# Param partitioning: trainable leaves vs BN running stats
# ---------------------------------------------------------------------------

def split_params(raw: dict):
    """raw {unit: {'w','b'?,'bn'?}} -> (trainable, bn_state).

    trainable: w, b, bn gamma/beta. bn_state: running mean/var.
    """
    trainable, bn_state = {}, {}
    for name, p in raw.items():
        t = {"w": p["w"]}
        if "b" in p:
            t["b"] = p["b"]
        if "bn" in p:
            t["gamma"] = p["bn"]["gamma"]
            t["beta"] = p["bn"]["beta"]
            bn_state[name] = {"mean": p["bn"]["mean"], "var": p["bn"]["var"]}
        trainable[name] = t
    return trainable, bn_state


def merge_params(trainable: dict, bn_state: dict) -> dict:
    """Inverse of split_params — rebuilds the raw-param schema."""
    raw = {}
    for name, t in trainable.items():
        p = {"w": t["w"]}
        if "b" in t:
            p["b"] = t["b"]
        if name in bn_state:
            p["bn"] = {"gamma": t["gamma"], "beta": t["beta"],
                       "mean": bn_state[name]["mean"],
                       "var": bn_state[name]["var"]}
        raw[name] = p
    return raw


# ---------------------------------------------------------------------------
# Train-mode forward (batch-stats BN)
# ---------------------------------------------------------------------------

def _unit_fwd(u: UnitSpec, trainable, bn_state, new_state, x, train: bool):
    p = trainable[u.name]
    if u.kind == "conv":
        out = conv2d(x, p["w"], p.get("b"), u.stride, u.padding, u.groups)
        axes = (0, 1, 2)
    else:
        out = linear(x, p["w"], p.get("b"))
        axes = (0,)
    if u.name in bn_state:
        if train:
            mean = out.mean(axes)
            var = out.var(axes)             # biased, for normalization
            cnt = np.prod([out.shape[a] for a in axes])
            unbiased = var * cnt / max(cnt - 1, 1)
            old = bn_state[u.name]
            new_state[u.name] = {
                "mean": (1 - BN_MOMENTUM) * old["mean"] + BN_MOMENTUM * mean,
                "var": (1 - BN_MOMENTUM) * old["var"] + BN_MOMENTUM * unbiased}
        else:
            mean = bn_state[u.name]["mean"]
            var = bn_state[u.name]["var"]
        out = (out - mean) * jax.lax.rsqrt(var + BN_EPS)
        out = out * p["gamma"] + p["beta"]
    return _activation(u.activation, out)


def forward_train(graph: Graph, trainable, bn_state, x, train: bool = True):
    """Returns (logits, updated bn_state)."""
    new_state = dict(bn_state)
    out = x
    for node in graph:
        if isinstance(node, OpSpec):
            if node.op == "maxpool":
                out = max_pool(out, node.window, node.stride, node.padding)
            elif node.op == "gap":
                out = global_avg_pool(out)
            elif node.op == "flatten":
                out = out.reshape(out.shape[0], -1)
            else:
                raise ValueError(node.op)
        elif isinstance(node, UnitSpec):
            out = _unit_fwd(node, trainable, bn_state, new_state, out, train)
        else:  # BlockSpec
            residual = out
            if node.downsample is not None:
                residual = _unit_fwd(node.downsample, trainable, bn_state,
                                     new_state, out, train)
            h = out
            for u in node.units:
                h = _unit_fwd(u, trainable, bn_state, new_state, h, train)
            if node.residual:
                h = h + residual
            out = _activation(node.post_activation, h)
    return out, new_state


# ---------------------------------------------------------------------------
# Optimizer + train loop
# ---------------------------------------------------------------------------

def make_optimizer(lr: float, total_steps: int, momentum: float = 0.9,
                   weight_decay: float = 5e-4, warmup: int = 200):
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, min(warmup, max(total_steps // 10, 1)), total_steps)
    return optax.chain(
        optax.add_decayed_weights(
            weight_decay,
            mask=lambda tr: jax.tree.map_with_path(
                lambda path, _: path[-1].key == "w", tr)),
        optax.sgd(sched, momentum=momentum, nesterov=True))


def train_model(graph: Graph, raw_params: dict, data_fn, steps: int,
                lr: float, key, chunk: int = 100, weight_decay: float = 5e-4,
                label_smooth: float = 0.1, eval_fn=None, eval_every: int = 1000,
                log=print):
    """Train; data_fn(key) -> (x NHWC, y). Returns trained raw params."""
    trainable, bn_state = split_params(raw_params)
    tx = make_optimizer(lr, steps, weight_decay=weight_decay)
    opt_state = tx.init(trainable)

    def step_fn(carry, _):
        trainable, bn_state, opt_state, key = carry
        key, kb = jax.random.split(key)
        x, y = data_fn(kb)

        def loss_fn(tr):
            logits, new_state = forward_train(graph, tr, bn_state, x, True)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            if label_smooth > 0:
                # standard uniform label smoothing
                ls = (1 - label_smooth) * ls - label_smooth * \
                    jax.nn.log_softmax(logits).mean()
            acc = (logits.argmax(-1) == y).mean()
            return ls, (new_state, acc)

        (loss, (new_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return (trainable, new_state, opt_state, key), (loss, acc)

    # XLA:CPU runs conv grads inside scan bodies single-threaded (~30x
    # slower than dispatching the jitted step from python — same autoselect
    # as recon/engine.py); on accelerators the scan amortizes dispatch RTT.
    use_scan = jax.devices()[0].platform != "cpu"
    if use_scan:
        @jax.jit
        def run_chunk(carry):
            return jax.lax.scan(step_fn, carry, None, length=chunk)
    else:
        jstep = jax.jit(step_fn)

        def run_chunk(carry):
            ls, accs = [], []
            for _ in range(chunk):
                carry, (l, a) = jstep(carry, None)
                ls.append(l)
                accs.append(a)
            return carry, (jnp.stack(ls), jnp.stack(accs))

    carry = (trainable, bn_state, opt_state, key)
    done = 0
    while done < steps:
        carry, (losses, accs) = run_chunk(carry)
        done += chunk
        log(f"step {done}/{steps} loss {float(losses.mean()):.4f} "
            f"train-acc {float(accs.mean()) * 100:.2f}%")
        if eval_fn is not None and (done % eval_every == 0 or done >= steps):
            acc = eval_fn(carry[0], carry[1])
            log(f"  test top-1: {acc:.2f}%")
    trainable, bn_state = carry[0], carry[1]
    return merge_params(trainable, bn_state)


@partial(jax.jit, static_argnums=(0,))
def _eval_correct(graph, trainable, bn_state, x, y):
    logits, _ = forward_train(graph, trainable, bn_state, x, train=False)
    return (logits.argmax(-1) == y).sum()


def eval_accuracy(graph, trainable, bn_state, x_test, y_test,
                  batch: int = 500) -> float:
    n = x_test.shape[0]
    correct = 0
    for i in range(0, n, batch):
        xb, yb = x_test[i:i + batch], y_test[i:i + batch]
        correct += int(_eval_correct(graph, trainable, bn_state, xb, yb))
    return 100.0 * correct / n


# ---------------------------------------------------------------------------
# Raw-param (pre-fold) checkpoint IO
# ---------------------------------------------------------------------------

def save_raw_params(path: str, raw: dict):
    flat = {}
    for name, p in raw.items():
        flat[f"{name}/w"] = np.asarray(p["w"])
        if "b" in p:
            flat[f"{name}/b"] = np.asarray(p["b"])
        if "bn" in p:
            for k, v in p["bn"].items():
                flat[f"{name}/bn/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_raw_params(path: str) -> dict:
    raw: dict = {}
    with np.load(path) as f:
        for key in f.files:
            parts = key.split("/")
            name = parts[0]
            raw.setdefault(name, {})
            if parts[1] == "bn":
                raw[name].setdefault("bn", {})[parts[2]] = jnp.asarray(f[key])
            else:
                raw[name][parts[1]] = jnp.asarray(f[key])
    return raw


# ---------------------------------------------------------------------------
# Data plumbing for the two on-device datasets
# ---------------------------------------------------------------------------

def make_data_fn(dataset: str, batch: int, train_arrays=None):
    """Returns a pure data_fn(key) -> (x, y) for the training scan."""
    if dataset == "synth10":
        from .data.realdata import synth10_batch
        return lambda key: synth10_batch(key, batch)
    if dataset == "digits":
        x_train, y_train = train_arrays
        n = x_train.shape[0]

        def fn(key):
            k1, k2, k3 = jax.random.split(key, 3)
            idx = jax.random.randint(k1, (batch,), 0, n)
            x, y = x_train[idx], y_train[idx]
            # +-2px random shift + mild noise (small-dataset augmentation)
            xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
            off = jax.random.randint(k2, (batch, 2), 0, 5)
            x = jax.vmap(lambda img, o: jax.lax.dynamic_slice(
                img, (o[0], o[1], 0), x.shape[1:]))(xp, off)
            x = x + 0.05 * jax.random.normal(k3, x.shape)
            return x, y
        return fn
    raise ValueError(f"no on-device trainer for dataset {dataset!r}")


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="On-device FP training")
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--dataset", default="synth10",
                    choices=["synth10", "digits"])
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--seed", type=int, default=1005)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--out", default="trained_{arch}_{dataset}.npz")
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                    help="cpu forces the local backend (the env var is "
                         "ignored on this platform — CLAUDE.md; also the "
                         "safe choice when the remote device is wedged)")
    args = ap.parse_args(argv)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from .models import zoo
    graph, _ = zoo.build(args.arch, num_classes=10, dataset="cifar10")

    import contextlib
    accel = jax.devices()[0]
    cpus = jax.local_devices(backend="cpu")
    setup_ctx = jax.default_device(cpus[0]) \
        if accel.platform != "cpu" and cpus else contextlib.nullcontext()

    with setup_ctx:
        from .models.resnet import init_params
        raw = init_params(jax.random.PRNGKey(args.seed), graph)
        if args.dataset == "digits":
            from .data.realdata import digits_arrays
            x_tr, y_tr, x_te, y_te = digits_arrays()
            train_arrays = (jnp.asarray(x_tr), jnp.asarray(y_tr))
        else:
            from .data.realdata import synth10_test_arrays
            x_te, y_te = synth10_test_arrays()
            train_arrays = None
    raw = jax.device_put(raw, accel)
    if train_arrays is not None:
        train_arrays = jax.device_put(train_arrays, accel)
    x_te_d = jax.device_put(jnp.asarray(x_te), accel)
    y_te_d = jax.device_put(jnp.asarray(y_te), accel)

    data_fn = make_data_fn(args.dataset, args.batch_size, train_arrays)
    eval_fn = lambda tr, bs: eval_accuracy(graph, tr, bs, x_te_d, y_te_d)
    trained = train_model(
        graph, raw, data_fn, args.steps, args.lr,
        jax.random.PRNGKey(args.seed + 1), chunk=args.chunk,
        weight_decay=args.weight_decay, eval_fn=eval_fn,
        eval_every=args.eval_every)
    final = eval_fn(*split_params(trained))
    out = args.out.format(arch=args.arch, dataset=args.dataset)
    save_raw_params(out, jax.device_get(trained))
    print(json.dumps({"arch": args.arch, "dataset": args.dataset,
                      "steps": args.steps, "fp_top1": final, "out": out}))
    return final


if __name__ == "__main__":
    main()
