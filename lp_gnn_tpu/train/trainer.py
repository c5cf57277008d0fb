"""Training engine (role of reference train.py:55-172), TPU-first.

Differences from the reference by design:

- Graphs are padded to static bucket shapes host-side (data/batching.py); the
  jitted train step compiles once per bucket instead of per graph.
- Optimizer is optax with torch-Adam semantics: L2 weight decay added to the
  gradient *before* the Adam moments (torch.optim.Adam(weight_decay=5e-4),
  train.py:86), StepLR(step=epochs//4, gamma=0.1) stepped per epoch
  (train.py:89).
- Oversize graphs (> edge_num_thresh) use the host-side static-shape
  subgraph sampler (data/sampling.py) replacing NeighborLoader
  (train.py:111-116).
- Checkpoint = full train state (params + opt state + epoch), written every
  epoch (the reference saves weights only, train.py:154-157 — SURVEY §5
  flags this as a gap the TPU build closes).
"""
from __future__ import annotations

import dataclasses
import logging
import os
import pickle
import time
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..data.batching import PaddedGraph, pad_graph
from ..data.dataset import LPDataset, split_train_val
from ..data.sampling import sample_subgraphs
from ..models.gcn import build_model, Model
from ..utils.misc import AverageMeter
from ..utils.serialize import json_dump
from .losses import LOSS_REGISTRY
from ..infer.decode import decode_topm_device


# ------------------------------------------------------------------ optimizer
def make_optimizer(opt: str = "adam", weight_decay: float = 5e-4):
    """Gradient transform matching torch.optim.{Adam,SGD}(weight_decay=...)
    (reference train.py:85-88). LR is applied separately per epoch."""
    if opt == "adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    return optax.add_decayed_weights(weight_decay)   # SGD: g + wd*p


def step_lr(base_lr: float, epochs: int, epoch: int, gamma: float = 0.1) -> float:
    """StepLR(step_size=max(epochs//4,1), gamma=0.1) (reference train.py:89)."""
    step_size = max(epochs // 4, 1)
    return base_lr * gamma ** (epoch // step_size)


# ----------------------------------------------------------------- train step
def seed_masks(pg: PaddedGraph):
    """Loss masks = first s_bs/t_bs real nodes (reference train.py:122-123)."""
    mi = jnp.arange(pg.c_feas.shape[0]) < pg.s_bs
    mj = jnp.arange(pg.v_feas.shape[0]) < pg.t_bs
    return mi & pg.cons_mask, mj & pg.vars_mask


def _step_accuracy(pg, lc, lv, ms, mt):
    """On-device seed decode accuracy — the same top-m decode the reference
    computes per step (train.py:132-137). Costs two argsorts over all padded
    nodes (decode.py), which at bench tier is a real share of the step — so
    callers gate it to the steps whose value is actually read (--step_acc)."""
    pc, pv = decode_topm_device(lc, lv, ms, mt, jnp.sum(ms))
    correct = jnp.sum((pc == pg.y_s) & ms) + jnp.sum((pv == pg.y_t) & mt)
    return correct / jnp.maximum(jnp.sum(ms) + jnp.sum(mt), 1)


def make_train_step(model: Model, loss_name: str, optimizer,
                    with_acc: bool = True):
    """``with_acc=False`` skips the per-step decode accuracy (returns
    -1.0). The returned step also accepts an optional TRACED ``acc_on``
    boolean (step(..., acc_on=jnp.bool_(x))) gating the accuracy via
    ``lax.cond`` inside ONE compiled program — the trainer's --step_acc 0
    path uses this so each bucket compiles once, not once per variant."""
    loss_fn = LOSS_REGISTRY[loss_name]

    def compute_loss(params, pg, rng):
        lc, lv = model.apply(params, pg, train=True, rng=rng)
        ms, mt = seed_masks(pg)
        loss = loss_fn(lc, lv, pg.y_s, pg.y_t, ms, mt)
        return loss, (lc, lv, ms, mt)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, pg, rng, lr, acc_on=None):
        (loss, (lc, lv, ms, mt)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params, pg, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        if acc_on is None:
            acc = (_step_accuracy(pg, lc, lv, ms, mt) if with_acc
                   else jnp.float32(-1.0))
        else:
            acc = jax.lax.cond(acc_on,
                               lambda: _step_accuracy(pg, lc, lv, ms, mt),
                               lambda: jnp.float32(-1.0))
        return params, opt_state, loss, acc

    return train_step


def make_scan_train_step(model: Model, loss_name: str, optimizer,
                         stacked: bool = True):
    """K sequential SGD steps in ONE jit dispatch via ``lax.scan`` —
    host-loop-free training, the TPU-idiomatic replacement for the
    reference's per-step Python loop (train.py:117-147). Semantics are
    exactly K calls of ``make_train_step``'s step (same update order, same
    per-step RNG), but per-dispatch host/runtime overhead is paid once per
    K steps instead of per step.

    stacked=True: ``pgs`` is a same-bucket PaddedGraph stack with leading
    axis K (one graph per step — the trainer's --steps_per_call path).
    stacked=False: ``pgs`` is a single PaddedGraph reused for all K steps
    (bench.py's repeated-step measurement).

    Returns step(params, opt_state, pgs, rngs(K,), lr, acc_on=None)
    -> (params, opt_state, losses (K,), accs (K,)). ``acc_on`` is an
    optional (K,) bool vector selecting which steps compute the decode
    accuracy (skipped steps report -1.0; ``None`` = all — see --step_acc).
    """
    loss_fn = LOSS_REGISTRY[loss_name]

    def compute_loss(params, pg, rng):
        lc, lv = model.apply(params, pg, train=True, rng=rng)
        ms, mt = seed_masks(pg)
        loss = loss_fn(lc, lv, pg.y_s, pg.y_t, ms, mt)
        return loss, (lc, lv, ms, mt)

    @partial(jax.jit, donate_argnums=(0, 1))
    def scan_step(params, opt_state, pgs, rngs, lr, acc_on=None):
        acc_vec = (jnp.ones(rngs.shape[0], bool) if acc_on is None
                   else acc_on)

        def body(carry, xs):
            params, opt_state = carry
            (pg, rng, want_acc) = xs if stacked else (pgs, *xs)
            (loss, (lc, lv, ms, mt)), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(params, pg, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            acc = jax.lax.cond(want_acc,
                               lambda: _step_accuracy(pg, lc, lv, ms, mt),
                               lambda: jnp.float32(-1.0))
            return (params, opt_state), (loss, acc)

        xs = (pgs, rngs, acc_vec) if stacked else (rngs, acc_vec)
        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), xs)
        return params, opt_state, losses, accs

    return scan_step


# ------------------------------------------------------------------ metrics IO
class MetricsWriter:
    """jsonl metrics + optional TensorBoard (reference utils.py:395-415)."""

    def __init__(self, log_dir: str, use_tb: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(os.path.join(log_dir, "tb_logs"))
            except Exception:
                self.tb = None

    def scalar(self, tag: str, value: float, step: int):
        import json
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "t": time.time()}) + "\n")
        self._f.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)

    def text(self, tag: str, value: str):
        if self.tb is not None:
            self.tb.add_text(tag, value)

    def close(self):
        self._f.close()
        if self.tb is not None:
            self.tb.close()


class NullWriter:
    """No-op MetricsWriter for non-primary processes of a multi-host run
    (all processes compute identically; only process 0 writes artifacts)."""

    def scalar(self, tag, value, step):
        pass

    def text(self, tag, value):
        pass

    def close(self):
        pass


# ---------------------------------------------------------------- checkpoints
def save_ckpt(path: str, params, opt_state=None, epoch: int = 0, extra=None):
    state = {"params": jax.device_get(params),
             "opt_state": jax.device_get(opt_state) if opt_state is not None else None,
             "epoch": epoch, "extra": extra or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_ckpt(path: str):
    """Load a checkpoint: the framework's own full-train-state pickle, or a
    reference PyTorch ``mdl.pth`` state_dict (detected by format, routed
    through models/torch_import) — so a reference user can point
    ``--load_from`` at their existing checkpoint and run predict -> warm
    start on TPU with zero retraining (reference arch.py:112-114 load)."""
    if _is_torch_checkpoint(path):
        from ..models.torch_import import load_torch_checkpoint
        return {"params": load_torch_checkpoint(path), "opt_state": None,
                "epoch": 0, "extra": {"source": "torch"}}
    with open(path, "rb") as f:
        return pickle.load(f)


def _is_torch_checkpoint(path: str) -> bool:
    """Sniff torch serialization: modern torch.save is a PK zip archive;
    legacy is a pickle whose payload reconstructs torch storages via
    GLOBAL/STACK_GLOBAL references into the ``torch`` package. The
    framework's own ckpt is a plain pickle of numpy arrays, so the decisive
    signal is a pickle opcode that IMPORTS from torch — not the byte string
    "torch" appearing anywhere in the stream (a framework ckpt whose extra
    metadata happened to contain that substring used to be misrouted)."""
    import pickletools
    with open(path, "rb") as f:
        if f.read(2) == b"PK":
            return True
        f.seek(0)
        last_strings: list[str] = []
        # legacy torch.save writes SEVERAL back-to-back pickle streams
        # (magic, protocol, sys_info, payload) — scan them all
        for _stream in range(8):
            try:
                for op, arg, _pos in pickletools.genops(f):
                    if op.name == "GLOBAL":
                        mod = str(arg).split(" ")[0]
                        if mod == "torch" or mod.startswith("torch."):
                            return True
                    elif "UNICODE" in op.name or "STRING" in op.name:
                        last_strings.append(str(arg))
                        last_strings = last_strings[-2:]
                    elif op.name == "STACK_GLOBAL":
                        # module pushed as the second-to-last string
                        mod = (last_strings[0]
                               if len(last_strings) == 2 else "")
                        if mod == "torch" or mod.startswith("torch."):
                            return True
            except Exception:
                # not parseable as a pickle (or past the last stream) —
                # let load_ckpt's own pickle.load raise the real error
                return False
            if not f.peek(1):
                break
    return False


# -------------------------------------------------------------------- run_exp
def run_exp(cfg: Config, dataset: LPDataset | None = None) -> str:
    """Full training run; returns the checkpoint path
    (reference train.py:55-172)."""
    log_dir = cfg.log_dir
    # multi-host: every process runs the same loop (collectives require all
    # participants); only process 0 touches the filesystem, and host arrays
    # stay numpy (local device_put commits would conflict with global meshes)
    n_procs = jax.process_count()
    is_primary = jax.process_index() == 0
    writer = MetricsWriter(log_dir) if is_primary else NullWriter()
    if is_primary:
        json_dump(cfg.to_dict(), os.path.join(log_dir, "args.json"))

    ds = dataset or LPDataset(cfg.dataset_processed_prefix)
    train_ds, val_ds = split_train_val(ds, cfg.seed)

    model = build_model(cfg.arch_with_dtype())
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = model.init(init_key)
    optimizer = make_optimizer(cfg.opt)
    opt_state = optimizer.init(params)
    start_epoch = 0
    if cfg.load_from.lower() != "none":
        ckpt = load_ckpt(cfg.load_from)
        params = ckpt["params"]
        # full train-state resume (the reference restores weights only,
        # train.py:155 comment — this closes that gap)
        if ckpt.get("opt_state") is not None:
            try:
                opt_state = ckpt["opt_state"]
                start_epoch = int(ckpt.get("epoch", 0))
            except Exception:
                logging.warning("opt state in ckpt incompatible; fresh optimizer")
        logging.info("resumed from %s at epoch %d", cfg.load_from, start_epoch)
    train_step = make_train_step(model, cfg.loss, optimizer)
    # --step_acc 0 (default): the decode-accuracy argsorts run only on the
    # steps whose value reaches the log (every 9th), gated by a traced
    # boolean inside ONE compiled step per bucket (lax.cond — a second
    # accuracy-free compile per bucket would double the dominant compile
    # cost of CPU runs).
    step_acc_always = bool(getattr(cfg, "step_acc", 0))

    # Distribution axes (--mesh_shape "dp=K,edge=M", SURVEY §2.3):
    #   edge=M : oversize graphs (> edge_num_thresh) train edge-partitioned
    #            FULL-graph across M devices — the TPU replacement for the
    #            reference's NeighborLoader sampling switch
    #            (train.py:102-116) — with boundary halo exchange for the
    #            halo-capable archs (DIST_HALO_ARCHS).
    #   dp=K   : same-bucket graphs stack K-way data-parallel (the
    #            reference has no DP at all, train.py:81-83).
    #   both   : ONE (dp, edge) device grid — oversize graphs are grouped
    #            into same-bucket batches and stepped through
    #            make_dp_edge_train_step (parallel/combined.py, the full
    #            multi-chip configuration); leftover oversize graphs run
    #            single-graph edge-partitioned on the grid's first row, and
    #            small graphs dp-stack on its first column.
    # Falls back with a warning when the arch has no distributed forward or
    # the mesh exceeds the device count.
    from ..parallel.mesh import parse_mesh_shape
    mesh_dims = parse_mesh_shape(getattr(cfg, "mesh_shape", "") or "")
    edge_size = int(mesh_dims.get("edge", 1))
    dp_size = int(mesh_dims.get("dp", 1))
    graph_batch = max(int(getattr(cfg, "graph_batch", 1)), 1)
    ndev = len(jax.devices())

    dist_step, edge_mesh, dist_halo = None, None, False
    combined_step = None
    dp_step, dp_mesh, stack_size = None, None, 0

    if dp_size > 1 and edge_size > 1 and dp_size * edge_size > ndev:
        logging.warning("mesh_shape dp=%d,edge=%d exceeds %d devices — "
                        "dropping the dp axis", dp_size, edge_size, ndev)
        dp_size = 1
    if edge_size > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.edge_partition import (make_dist_train_step,
                                               DIST_MODELS, DIST_HALO_ARCHS)
        if edge_size > ndev:
            logging.warning("mesh_shape edge=%d exceeds %d devices — "
                            "oversize graphs fall back to sampling",
                            edge_size, ndev)
        elif model.name not in DIST_MODELS:
            logging.warning("arch %s has no distributed forward — oversize "
                            "graphs fall back to sampling", model.name)
        else:
            dist_halo = model.name in DIST_HALO_ARCHS
            if dp_size > 1:
                # the full 2-D configuration: ONE device grid for every
                # step. The pure-edge (leftover oversize) and pure-dp
                # (small-stack) steps run over the same grid with the
                # unused axis replicated — mixing device sets across steps
                # would make jit reject the shared params pytree.
                from ..parallel.combined import make_dp_edge_train_step
                combined_mesh = make_mesh({"dp": dp_size, "edge": edge_size})
                combined_step = make_dp_edge_train_step(
                    cfg.loss, optimizer, combined_mesh, arch=model.name)
                edge_mesh = combined_mesh
                dp_mesh = combined_mesh
                logging.info("combined dp x edge training: %d x %d grid, "
                             "arch %s, %s collectives", dp_size, edge_size,
                             model.name,
                             "halo" if dist_halo else "all-gather")
            else:
                edge_mesh = make_mesh({"edge": edge_size})
            dist_step = jax.jit(make_dist_train_step(
                cfg.loss, optimizer, edge_mesh, arch=model.name))
            logging.info("edge-partitioned training: %d shards, %s "
                         "collectives", edge_size,
                         "halo" if dist_halo else "all-gather")

    # multi-host host-prep sharding (r04 item 8): partitioning an oversize
    # graph is the dominant per-graph host cost (~16 s per 10M edges,
    # scripts/bench_partition.py) and every process used to redo all of it.
    # With the on-disk partition cache on a shared filesystem, process i
    # builds only graphs i, i+P, ... and the barrier lets every process
    # then LOAD all partitions — step-time data stays identical per the
    # multi-host contract, but the redundant prep is divided by P. (The
    # combined dp x edge batch partitions are built per-batch and are not
    # covered; real deployments without a shared FS should set
    # --part_cache 0 — see ARCHITECTURE.md.)
    # (skipped in combined dp x edge mode: covered oversize graphs use
    # per-BATCH partitions built by partition_batch, which never read this
    # cache — prebuilding every graph single-graph would pay the full host
    # prep the sharding exists to avoid, for files mostly never loaded)
    if (n_procs > 1 and dist_step is not None and combined_step is None
            and getattr(cfg, "part_cache", 1)
            and getattr(cfg, "dataset_processed_prefix", "")):
        from jax.experimental import multihost_utils
        from ..parallel.edge_partition import cached_partition_graph
        part_dir = os.path.join(cfg.dataset_processed_prefix, "partitions")
        for gi in range(len(train_ds)):
            if gi % n_procs != jax.process_index():
                continue
            g = train_ds[gi]
            if g.nnz > cfg.edge_num_thresh:
                cached_partition_graph(pad_graph(g), edge_size,
                                       halo=dist_halo, cache_dir=part_dir,
                                       fn=getattr(g, "fn", None))
        multihost_utils.sync_global_devices("lp_gnn_partition_prebuild")

    # host-side padded-graph cache: pad once, reuse across epochs
    padded_cache: dict[int, PaddedGraph] = {}

    def batches_for(idx: int, rng_np):
        if idx not in padded_cache:
            g = train_ds[idx]
            if g.nnz <= cfg.edge_num_thresh:
                # device-resident cache: upload once, reuse across epochs
                # (host->device transfers dominate step time on tunneled
                # devices otherwise). Multi-host keeps numpy: a local
                # device_put would conflict with the global device set.
                pg_new = pad_graph(g)
                if n_procs == 1:
                    pg_new = jax.device_put(pg_new)
                if getattr(cfg, "cache_in_agg", 1):
                    # precompute the input conv's (constant) aggregations
                    # once per graph — exact, removes 2 traversals/step
                    from ..ops.spmm import attach_input_agg
                    pg_new = attach_input_agg(pg_new, jnp.dtype(model.dtype))
                    if n_procs > 1:
                        pg_new = jax.device_get(pg_new)
                padded_cache[idx] = pg_new
            elif dist_step is not None:
                from ..parallel.edge_partition import (cached_partition_graph,
                                                       attach_dist_input_agg)
                part_dir = (os.path.join(cfg.dataset_processed_prefix,
                                         "partitions")
                            if getattr(cfg, "part_cache", 1) and
                            getattr(cfg, "dataset_processed_prefix", "")
                            else None)
                dg = cached_partition_graph(pad_graph(g), edge_size,
                                            halo=dist_halo,
                                            cache_dir=part_dir,
                                            fn=getattr(g, "fn", None))
                # the GEN archs cannot cache the input aggregation (softmax
                # weights depend on the params)
                if getattr(cfg, "cache_in_agg", 1) and "GEN" not in model.name:
                    dg = attach_dist_input_agg(dg, edge_mesh)
                padded_cache[idx] = ("dist", dg)
            else:
                padded_cache[idx] = None   # sampled path, not cached
        pg = padded_cache[idx]
        if pg is not None:
            return [pg]
        g = train_ds[idx]
        depth = max(cfg.arch_depth() - 1, 1)
        return sample_subgraphs(g, rng_np, fanout=[6] * depth,
                                batch_size=cfg.batch_size)

    # dp-stacked small-graph step: --mesh_shape "dp=K" shards same-bucket
    # graph stacks over K devices, and --graph_batch B additionally vmaps B
    # graphs per shard — B>1 on a single device gives graph-batched training
    # (one dispatch per B graphs, gradient of the mean loss instead of B
    # sequential steps).
    if dp_size > ndev:
        logging.warning("mesh_shape dp=%d exceeds %d devices — falling back "
                        "to single-device steps%s", dp_size, ndev,
                        " (graph_batch dropped too)" if graph_batch > 1 else "")
        dp_size, graph_batch = 1, 1
    if dp_size > 1 or graph_batch > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.dp import make_dp_train_step
        if dp_mesh is None:
            dp_mesh = make_mesh({"dp": dp_size})
        dp_step = make_dp_train_step(model, cfg.loss, optimizer, dp_mesh)
        stack_size = dp_size * graph_batch
        logging.info("batched training: %d device(s) x %d graphs per step",
                     dp_size, graph_batch)

    # --steps_per_call K: scan K sequential SGD steps (one same-bucket graph
    # each) inside one jit dispatch — exact step semantics, K-fold fewer
    # host dispatches. Composes with neither dp nor graph_batch (those
    # already batch per dispatch).
    scan_step, scan_k = None, max(int(getattr(cfg, "steps_per_call", 1)), 1)
    if dp_step is None and scan_k > 1:
        scan_step = make_scan_train_step(model, cfg.loss, optimizer,
                                         stacked=True)
        logging.info("scanned training: %d steps per dispatch", scan_k)

    loss_meter, acc_meter = AverageMeter(), AverageMeter()
    glstep = 0
    ckpt_path = os.path.join(log_dir, "mdl.ckpt")
    rng_np = np.random.RandomState(cfg.seed)
    n_train = len(train_ds)
    # --trace: profile the first post-warmup epoch (compiles happen in the
    # first one) into {log_dir}/trace — a TB-viewable xplane of the hot path
    trace_epoch = start_epoch + 1 if cfg.epochs - start_epoch > 1 else start_epoch
    trace_cm = None
    for epoch in range(start_epoch, cfg.epochs):
        lr = step_lr(cfg.lr, cfg.epochs, epoch)
        if epoch % 99 == 0:
            # resource snapshot cadence of the reference (train.py:99-100)
            from ..utils.profiling import show_resource
            show_resource()
        if getattr(cfg, "trace", 0) and epoch == trace_epoch:
            from ..utils.profiling import trace as _prof_trace
            trace_cm = _prof_trace(os.path.join(log_dir, "trace"))
            trace_cm.__enter__()
        loss_meter.reset(), acc_meter.reset()
        order = rng_np.permutation(n_train)

        def log_step(idx_graphs, loss_v, acc_v):
            assert not np.isnan(loss_v), "nan loss (reference train.py:126)"
            loss_meter.update(loss_v)
            if acc_v is not None:   # dp steps report no per-step accuracy
                acc_meter.update(acc_v)
            if glstep % 9 == 1:
                logging.info("ep %d %d/%d step %d loss %.4f acc %.4f lr %g",
                             epoch, idx_graphs, n_train, glstep,
                             loss_meter.avg, acc_meter.avg, lr)
                writer.scalar("epoch", epoch, glstep)
                writer.scalar("train/loss", loss_meter.avg, glstep)
                writer.scalar("train/acc", acc_meter.avg, glstep)
                writer.scalar("train/lr", lr, glstep)

        def stacked_groups(size: int, device_put_batches: bool):
            """Group stackable FULL graphs into same-signature stacks of
            ``size``. Grouping must use the full leaf-shape signature: the
            blocked-layout chunk count is data-dependent, so two graphs can
            share a bucket yet not be stackable. Built once (epoch 0) and
            cached; oversize graphs are excluded — their fanout-sampled
            subgraphs must be redrawn per epoch (reference train.py:111-116
            resamples via NeighborLoader every pass), so they are returned
            as indices and sampled by the caller each epoch."""
            cache_key = ("stacks", size)
            if cache_key not in padded_cache:
                from ..parallel.dp import stack_graphs
                by_sig: dict = {}
                singles, sampled_idxs = [], []
                for gi in range(n_train):
                    if train_ds[gi].nnz > cfg.edge_num_thresh:
                        sampled_idxs.append(gi)
                        continue
                    pg = jax.device_get(batches_for(gi, rng_np)[0])
                    sig = tuple(x.shape for x in jax.tree.leaves(pg))
                    by_sig.setdefault(sig, []).append(pg)
                batches = []
                for group in by_sig.values():
                    while len(group) >= size:
                        b = stack_graphs(group[:size])
                        batches.append(jax.device_put(b)
                                       if device_put_batches else b)
                        group = group[size:]
                    singles.extend(group)
                padded_cache[cache_key] = (batches, singles, sampled_idxs)
            return padded_cache[cache_key]

        def dist_stacked_groups(size: int):
            """Group OVERSIZE graphs into same-bucket (dp x edge) batches of
            ``size`` via partition_batch — the combined-step work units.
            Leftover oversize graphs (bucket count % size) stay on the
            single-graph edge-partitioned path. Built once and cached (full
            graphs are never resampled). Returns (batches, covered_idxs)."""
            cache_key = ("dist_stacks", size)
            if cache_key not in padded_cache:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..parallel.combined import partition_batch
                by_bucket: dict = {}
                for gi in range(n_train):
                    if train_ds[gi].nnz > cfg.edge_num_thresh:
                        pgi = pad_graph(train_ds[gi])
                        by_bucket.setdefault(pgi.bucket_key(),
                                             []).append((gi, pgi))
                batches, covered = [], set()
                # (multi-host keeps the agg off: the per-graph attach would
                # yield edge-sharded global arrays that cannot host-stack)
                agg_mesh = edge_mesh if (getattr(cfg, "cache_in_agg", 1)
                                         and "GEN" not in model.name
                                         and n_procs == 1) else None
                for group in by_bucket.values():
                    while len(group) >= size:
                        chunk, group = group[:size], group[size:]
                        b = partition_batch([pgi for _, pgi in chunk],
                                            edge_size, halo=dist_halo,
                                            input_agg_mesh=agg_mesh)
                        if n_procs == 1:
                            # grid-resident (matching the step's in_specs):
                            # a plain device_put would commit to device 0
                            # and re-shard the whole batch every step
                            b = jax.device_put(
                                b, NamedSharding(combined_mesh,
                                                 P("dp", "edge")))
                        batches.append(b)
                        covered.update(gi for gi, _ in chunk)
                padded_cache[cache_key] = (batches, covered)
            return padded_cache[cache_key]

        def run_one(idx_graphs, pg):
            nonlocal params, opt_state, glstep, key
            key, sk = jax.random.split(key)
            glstep += 1
            if isinstance(pg, tuple) and pg[0] == "dist":
                # edge-partitioned full-graph step (no per-step accuracy —
                # logits stay sharded; eval passes score exactly)
                params, opt_state, loss = dist_step(params, opt_state,
                                                    pg[1], sk,
                                                    jnp.float32(lr))
                log_step(idx_graphs, float(loss), None)
                return
            grid = (combined_mesh if combined_step is not None else
                    edge_mesh if (n_procs > 1 and edge_mesh is not None) else
                    dp_mesh if (n_procs > 1 and dp_mesh is not None) else
                    None)
            if grid is not None:
                # params live replicated on the device grid after a
                # distributed step; place the graph there too so the plain
                # jitted step shares the device set (global under multi-host
                # — including dp-only meshes, whose dp_step also commits
                # params to the global device set)
                from jax.sharding import NamedSharding, PartitionSpec
                pg = jax.device_put(pg, NamedSharding(grid, PartitionSpec()))
            want_acc = step_acc_always or glstep % 9 == 1
            params, opt_state, loss, acc = train_step(
                params, opt_state, pg, sk, jnp.float32(lr),
                jnp.bool_(want_acc))
            acc = float(acc)
            log_step(idx_graphs, float(loss), acc if acc >= 0 else None)

        def run_singles_and_sampled(singles, sampled_idxs):
            for pg in singles:
                run_one(0, pg)
            for gi in sampled_idxs:
                # fresh subgraph sample every epoch (dist graphs are cached)
                for pg in batches_for(int(gi), rng_np):
                    run_one(0, pg)

        if dp_step is not None:
            covered = set()
            if combined_step is not None:
                # the full 2-D configuration: dp-sized batches of
                # edge-partitioned oversize graphs, one grid step each
                dist_batches, covered = dist_stacked_groups(stack_size)
                for bi in rng_np.permutation(len(dist_batches)):
                    key, sk = jax.random.split(key)
                    glstep += 1
                    params, opt_state, loss = combined_step(
                        params, opt_state, dist_batches[int(bi)], sk,
                        jnp.float32(lr))
                    log_step(0, float(loss), None)
            batches, singles, sampled_idxs = stacked_groups(
                stack_size, device_put_batches=False)
            for bi in rng_np.permutation(len(batches)):
                key, sk = jax.random.split(key)
                glstep += 1
                params, opt_state, loss = dp_step(
                    params, opt_state, batches[int(bi)], sk, jnp.float32(lr))
                log_step(0, float(loss), None)
            run_singles_and_sampled(
                singles, [gi for gi in sampled_idxs if gi not in covered])
        elif scan_step is not None:
            batches, singles, sampled_idxs = stacked_groups(
                scan_k, device_put_batches=True)
            for bi in rng_np.permutation(len(batches)):
                key, sk = jax.random.split(key)
                sks = jax.random.split(sk, scan_k)
                acc_on = (np.ones(scan_k, bool) if step_acc_always else
                          np.array([(glstep + i + 1) % 9 == 1
                                    for i in range(scan_k)]))
                params, opt_state, losses, accs = scan_step(
                    params, opt_state, batches[int(bi)], sks,
                    jnp.float32(lr), jnp.asarray(acc_on))
                for lv_, av_ in zip(np.asarray(losses), np.asarray(accs)):
                    glstep += 1
                    log_step(0, float(lv_),
                             float(av_) if av_ >= 0 else None)
            run_singles_and_sampled(singles, sampled_idxs)
        else:
            for idx_graphs, gi in enumerate(order):
                for pg in batches_for(int(gi), rng_np):
                    run_one(idx_graphs, pg)
        if trace_cm is not None and epoch == trace_epoch:
            trace_cm.__exit__(None, None, None)
            trace_cm = None
        # store the NEXT epoch to run so resume does not repeat this one
        if is_primary:
            save_ckpt(ckpt_path, params, opt_state, epoch + 1,
                      extra={"arch": cfg.arch, "loss": cfg.loss})
        if cfg.eval_every and (epoch + 1) % cfg.eval_every == 0 and len(val_ds):
            va = _quick_val(model, params, val_ds, cfg)
            writer.scalar("val/acc", va, glstep)
            logging.info("epoch %d val acc %.4f", epoch, va)
    if is_primary:
        save_ckpt(ckpt_path, params, opt_state, cfg.epochs,
                  extra={"arch": cfg.arch, "loss": cfg.loss})
    writer.close()
    return ckpt_path


def _quick_val(model, params, val_ds, cfg) -> float:
    """Mean decode accuracy over the val split (the in-training validation
    the reference left commented out, train.py:149-152)."""
    from ..train.metrics import accuracy
    total = 0.0
    for i in range(len(val_ds)):
        g = val_ds[i]
        pg = pad_graph(g)
        from ..infer.predict import _jit_apply
        lc, lv = _jit_apply(model)(params, pg)
        logits = np.concatenate([np.asarray(lc)[: g.ncons],
                                 np.asarray(lv)[: g.nvars]])
        gt = np.concatenate([g.y_s, g.y_t])
        total += accuracy(logits, gt, g.ncons, dataset_name=cfg.dataset)
    return total / max(len(val_ds), 1)
