"""Configuration / experiment environment (role of reference utils.py:684-854).

Same CLI surface and derived-path schema as the reference ``Environment`` so the
on-disk dataflow contract (SURVEY.md §1) is preserved:

    {data_prefix}/{dataset}/mps/*.mps[.gz]
    {data_prefix}/{dataset}/{solver_prefix}basis[-mM]/*.bas
    {data_prefix}/{dataset}/log/{solver_prefix}no-bas[-mM]/*.log
    {data_prefix}/{dataset}/{solver_prefix}inp_tgt[-mM]/{raw,processed}/*.pk
    {log_prefix}/{exp_nm}/...

Model / loss / inference-manager selection is by *name lookup in registries*
instead of the reference's ``eval()`` of CLI strings (utils.py:723 ``eval``
pattern, train.py:79,125) — same expressiveness, no arbitrary code execution.
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import re
from typing import Any

from .utils.misc import increment_path, init_seeds, mkdir_p

LP_METHOD_MAP = {"dual": 1, "primal": 4}


def apply_platform_env() -> None:
    """Honor LP_GNN_PLATFORM={cpu,tpu,...}: the axon TPU plugin ignores the
    JAX_PLATFORMS env var, so CPU-only runs (CI, multi-chip simulation with
    xla_force_host_platform_device_count) need an in-process config update
    before first backend use. Also enables the persistent XLA compilation
    cache (first TPU compile of the big einsums takes minutes; reruns of
    the CLI pipeline should not pay it again — previously only bench.py
    did this)."""
    import jax
    plat = os.environ.get("LP_GNN_PLATFORM", "")
    if plat and plat != "tpu":
        jax.config.update("jax_platforms", plat)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/lp_gnn_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:   # older jax without the knobs
        pass
    # multi-host: join the DCN job (LP_GNN_DIST_* env contract) before the
    # first backend touch, so the production entry points — train.py,
    # run_train_test.py, the predict/val drivers — are multi-host-capable,
    # not only scripts/dryrun_multihost.py (SURVEY §5 comm-backend row).
    from .parallel.mesh import maybe_init_distributed
    maybe_init_distributed()


@dataclasses.dataclass
class Config:
    # experiment
    exp_nm: str = "tmp"
    dataset: str = "None"
    data_prefix: str = "lp-dataset"
    log_prefix: str = "runs"
    solver_prefix: str = "highs-"
    exist_ok: int = 1
    seed: int = 0
    verbose: int = 0
    skip_exist: int = 0
    chunk: str | None = None
    split: str = "val"            # val | trainval
    # model / training
    arch: str = "GCN_FC(8,8,hids=128)"
    loss: str = "balanced"        # unbalanced | balanced | focal
    opt: str = "adam"
    lr: float = 1e-3
    epochs: int = 30
    batch_size: int = 10240 * 8 * 4        # max seed nodes per sampled batch
    edge_num_thresh: float = 4e6 * 3       # full-graph vs sampled switch
    num_workers: int = 0
    load_from: str = "None"
    fp16: int = 0                          # reference --fp16; here: bf16 compute
    # solver
    lp_method: int | str = 1               # 1=dual, 4=primal (run_solver.py:12)
    engine: str = "highs"                  # highs (bridge) | native (C++ runtime)
    inference_manager: str = "InferenceManager(0,)"
    gW: float | None = None
    warm_gate: str = "auto"                # warm-start payback gate:
                                           # "auto" = calibrate on a few
                                           # TRAIN-split LPs at predict time
                                           # (decode -> warm solve -> compare
                                           # vs cold logs) and DECLINE the
                                           # val warm starts when the
                                           # measured payback is <= 0, so no
                                           # family regresses below cold
                                           # (reference val.py:137-165 frames
                                           # the sparsity decode as exactly
                                           # such a fallback); "off" = always
                                           # warm-start (pre-r04 behavior).
    warm_gate_k: int = 5                   # min calibration LPs before the
                                           # gate may decide (adaptive: it
                                           # keeps sampling while the 90%
                                           # t-interval on the mean payback
                                           # straddles 0, up to warm_gate_kmax)
    warm_gate_kmax: int = 12               # calibration budget cap; at
                                           # exhaustion the gate DECLINES only
                                           # when the interval's upper bound
                                           # is <= 0 (measured harm, not noise)
    # parallelism (new, TPU build)
    mesh_shape: str = ""                   # e.g. "dp=4" or "edge=8"
    graph_batch: int = 1                   # same-bucket graphs vmapped per step
    part_cache: int = 1                    # persist edge partitions beside
                                           # processed/*.pk (partitions/ dir)
                                           # so training epoch 0 and every
                                           # inference pass reload instead of
                                           # recomputing (~16 s host work per
                                           # 10M-edge graph, bench_partition)
    cache_in_agg: int = 1                  # precompute input-conv aggregation
                                           # per graph (exact; see
                                           # ops/spmm.py attach_input_agg)
    steps_per_call: int = 1                # K sequential SGD steps per jit
                                           # dispatch (lax.scan over same-
                                           # bucket graph stacks) — exact
                                           # semantics, amortized dispatch
                                           # (per dp shard; 1 = reference
                                           # semantics of one graph per step.
                                           # NB: on TPU the vmapped SpMM gather
                                           # is slower than sequential steps —
                                           # measured 0.6x/graph at bench tier —
                                           # so >1 mainly serves CPU runs)
    step_acc: int = 0                      # 1 = compute the per-step decode
                                           # accuracy on EVERY step (reference
                                           # train.py:132-137 semantics: the
                                           # logged value averages the last 10
                                           # consecutive steps). 0 (default) =
                                           # compute it only on steps whose
                                           # value is logged (every 9th,
                                           # trainer log cadence) — the decode
                                           # argsorts over all padded nodes
                                           # are a real share of a bench-tier
                                           # step; the logged metric is then
                                           # smoothed over the last 10
                                           # *logged* steps instead.
    eval_every: int = 0                    # epochs between val passes (0=off)
    trace: int = 0                         # capture an XLA profiler trace of
                                           # the first post-warmup train steps
                                           # into {log_dir}/trace
    # derived (filled by finalize)
    dataset_prefix: str = ""
    dataset_processed_prefix: str = ""
    log_dir: str = ""

    # ------------------------------------------------------------------ helpers
    def get_method_sfx(self) -> str:
        m = self.normalized_lp_method()
        return "" if m == 1 else f"-m{m}"

    def normalized_lp_method(self) -> int:
        m = self.lp_method
        if isinstance(m, str):
            m = LP_METHOD_MAP.get(m, m)
        return int(m)

    def arch_depth(self) -> int:
        """Parse depth from the arch string (reference train.py:108-110)."""
        m = re.findall(r"depth=(\d+)", self.arch)
        return int(m[0]) if m else 3

    def arch_with_dtype(self) -> str:
        """Arch string honoring --fp16 (reference --fp16 model.half(),
        val.py:269; on TPU this selects bf16 compute with the knowledge mask
        kept fp32)."""
        if self.fp16 and "dtype" not in self.arch:
            base = self.arch.strip()[:-1]   # drop the closing ')'
            sep = "" if base.endswith("(") else ","   # argless, e.g. GCNRand()
            return base + sep + "dtype='bfloat16')"
        return self.arch

    def double_check(self, key: str = "all") -> None:
        """Config consistency guard (reference utils.py:789-794)."""
        assert self.normalized_lp_method() in (1, 4)
        if key == "lp_method":
            return
        if clean_str(self.arch) not in clean_str(self.exp_nm):
            logging.warning("exp_nm %r does not encode arch %r",
                            self.exp_nm, self.arch)

    def finalize(self, make_log_dir: bool = True) -> "Config":
        self.lp_method = self.normalized_lp_method()
        if not self.solver_prefix.endswith("-"):
            self.solver_prefix += "-"
        assert self.solver_prefix == "highs-", self.solver_prefix
        self.dataset_prefix = os.path.join(self.data_prefix, self.dataset)
        self.dataset_processed_prefix = os.path.join(
            self.dataset_prefix, f"{self.solver_prefix}inp_tgt{self.get_method_sfx()}")
        log_dir = os.path.join(self.log_prefix, self.exp_nm)
        if make_log_dir:
            log_dir = increment_path(log_dir, exist_ok=bool(self.exist_ok))
            mkdir_p(log_dir)
        self.log_dir = log_dir
        init_seeds(self.seed)
        return self

    def cvt_to_str(self) -> str:
        """Serialize args for subprocess stages (reference utils.py:796-802)."""
        skip = {"dataset_prefix", "dataset_processed_prefix", "log_dir"}
        out = []
        for f in dataclasses.fields(self):
            if f.name in skip:
                continue
            v = getattr(self, f.name)
            if v is None or v == "":
                continue
            out.append(f"--{f.name} {v}")
        return " ".join(out)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


def clean_str(s: str) -> str:
    """Encode an arch/config string into an exp-name-safe token
    (reference utils.py:857-860)."""
    for ch in "()=,.":
        s = s.replace(ch, "-")
    return s


#: dataset tokens recoverable from an exp name, longest-prefix-wins order
#: (this framework's families + the reference's own list, utils.py:862-865).
_DATASET_TRIES = (
    "mirp_like-perm", "mirp_like", "mirp_bench", "miplib_like-perm",
    "miplib_like", "transport-perm", "transport", "netflow-perm", "netflow",
    "packing-perm", "packing", "stoch-perm", "svm-perm", "svm",
    "small-perm", "medium-inv", "medium-perm", "medium", "mirp", "small",
    "libsvm_6", "miplib_8", "generated_15-10", "generated_15-1",
    "stoch-sc-5", "stoch-sc", "stoch-el", "stoch",
)


def parse_str(exp_nm: str, key: str) -> str:
    """Recover a config token from an exp name (reference utils.py:862-879).

    Keys: 'dataset' (first match in the tries list), 'arch' (GCN_FC
    hids/depth grid, matched through clean_str encoding), and
    'solver_prefix' (the extract_time.py:52 use)."""
    if key == "dataset":
        # longest-token-wins regardless of listing order (an exp name
        # containing 'libsvm_6' must not match the shorter 'svm' first)
        for t in sorted(_DATASET_TRIES, key=len, reverse=True):
            if t in exp_nm:
                return t
        raise ValueError(f"parse fail: no dataset token in {exp_nm!r}")
    if key == "arch":
        for hids in (128, 256, 512, 1024):
            for depth in (3, 5, 7, 9):
                t = f"GCN_FC(8,8,hids={hids},depth={depth})"
                if clean_str(t) in exp_nm:
                    return t
        raise ValueError(f"parse fail: no arch token in {exp_nm!r}")
    if key == "solver_prefix":
        for sv in ("highs-",):
            if exp_nm.startswith(sv) or f"-{sv}" in exp_nm:
                return sv
        return ""
    raise KeyError(key)


def parse_args(argv=None, make_log_dir: bool = True, **defaults) -> Config:
    """CLI entry mirroring reference ``Environment()`` (utils.py:684-854)."""
    apply_platform_env()
    cfg = Config(**defaults)
    parser = argparse.ArgumentParser(conflict_handler="resolve")
    for f in dataclasses.fields(cfg):
        if f.name in ("dataset_prefix", "dataset_processed_prefix", "log_dir"):
            continue
        v = getattr(cfg, f.name)
        tp = type(v) if v is not None and not isinstance(v, bool) else str
        if f.name == "lp_method":
            tp = str   # accepts 1/4 and 'dual'/'primal' (LP_METHOD_MAP)
        parser.add_argument(f"--{f.name}", type=tp if tp is not type(None) else str,
                            default=v)
    known, unknown = parser.parse_known_args(argv)
    if unknown:
        logging.warning("unknown args: %s", unknown)
    for k, v in vars(known).items():
        setattr(cfg, k, v)
    cfg.finalize(make_log_dir=make_log_dir)
    if make_log_dir:
        # attach the per-run file log (reference Environment attaches
        # log-ing/log-prt, utils.py:452-497)
        from .utils.log import set_file_logger, set_file_logger_prt
        set_file_logger(cfg.log_dir)
        set_file_logger_prt(cfg.log_dir)
    return cfg
