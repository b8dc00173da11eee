"""Config system: pydantic models parsed from TOML, with the reference's key
surface (ref: framework/configs.py:15-197, baseline/pipelines/nerf.py:63,
snerf.py:67, satnerf.py:115, semantic/pipelines/rs_semantic.py:125).

Differences from the reference, by design:
* the pipeline is selected by a registry name ("nerf" | "snerf" | "satnerf" |
  "rs_semantic") instead of an importlib dotted path — dotted paths from
  reference TOMLs are accepted and mapped for compatibility;
* GPU-selection keys become TPU/mesh keys (``data_parallel``: number of mesh
  devices to shard ray batches over; ``compute_dtype``).

TOML parsing uses stdlib tomllib; dumping uses a small in-house writer (the
``toml`` package is not available in this image).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional

try:  # tomllib is stdlib on 3.11+
    import tomllib
except ImportError:  # pragma: no cover - Python 3.10
    try:
        import tomli as tomllib
    except ImportError as _exc:
        raise ImportError(
            "satnerf_tpu needs tomllib (Python >= 3.11) or the tomli package"
        ) from _exc

from pydantic import BaseModel

from satnerf_tpu.logger import logger

# --------------------------------------------------------------------------
# run config (ref: framework/configs.py:15-62 RunConfig)
# --------------------------------------------------------------------------


class RunConfig(BaseModel):
    # training duration / cadence
    max_train_steps: int = 300000
    save_every_n_epochs: int = -1
    check_val_every_n_epoch: int = 1
    num_sanity_val_steps: int = 1
    shuffle_dataset: bool = True
    deterministic: bool = False
    seed: int = 42

    # device / precision (TPU-native replacements for gpu_id etc.)
    data_parallel: int = 1  # devices on the 'data' mesh axis
    # >1: lax.scan this many train steps inside ONE device dispatch. Removes
    # per-step host dispatch latency (significant for small ray batches and
    # for remote-tunneled devices); boundaries (logging, epoch ends, the
    # depth-supervision drop, preemption checks) stay step-accurate because
    # blocks never cross them.
    steps_per_dispatch: int = 1
    matmul_precision: str = "high"  # "highest" | "high" | "default"
    device_req_free: bool = True  # refuse to share the single-tenant TPU

    # resume
    resume_from_ckpoint: bool = False
    ckpoint_fp: Optional[str] = None
    # warm start: load PARAMS ONLY from a checkpoint directory (fresh
    # optimizer state, step 0) — the reference's ckpoint_fp partial-transfer
    # flow (ref: framework/util/load_ckpoint.py:94-129). When the target
    # model is hierarchical and the source checkpoint has no fine field,
    # the fine field is seeded from the trained coarse field.
    warm_start_fp: Optional[str] = None

    run_name_postfix: str = ""
    experiment_category: str = ""

    # dataset
    dataset_name: str = ""
    dataset_limit_train_images: int = 0  # 0/false = all

    # paths
    workspace_dp: str = ""
    cache_dp: str = ""
    datasets_dp: str = ""

    # populated at run start
    run_dp: str = ""
    run_name: str = ""

    @property
    def dataset_dp(self) -> str:
        return os.path.join(self.datasets_dp, self.dataset_name)


# --------------------------------------------------------------------------
# pipeline configs (chain mirrors the reference class chain)
# --------------------------------------------------------------------------


class NeRFConfig(BaseModel):
    pipeline: str = "nerf"
    precision: int = 32
    use_utm_coordinate_system: bool = False
    version: int = 1

    n_samples: int = 64
    use_fine_network: bool = False
    n_importance: int = 0
    render_chunk_size: int = 40960
    # validation render chunk in RAYS. 0 = auto: floor the reference's
    # points-per-chunk knob (render_chunk_size / n_samples) at 8192 rays so
    # big-image validation is not tunnel-latency-bound (train/loop.py). Set
    # explicitly to keep a small chunk as a memory escape hatch (e.g.
    # hierarchical eval with n_importance fine rungs tripling points/ray).
    val_chunk_rays: int = 0
    batch_size: int = 1024
    learnrate: float = 5e-4
    noise_std: float = 0.0
    fc_units: int = 512
    fc_layers: int = 8
    fc_skips: list[int] = [4]
    activation_function: str = "siren"
    # "poly": fast_sin minimax SIREN activation (~2e-6 abs err, ~2x faster
    # end-to-end on TPU); "poly5": degree-5 kernel (+8% step, PSNR-neutral
    # but measured ~0.9 m DSM-MAE cost — opt-in, for PSNR-bound workloads);
    # "poly7f": one-term reduction + degree-7 kernel (<=4e-5 err, splits
    # poly5's saving — measurement-gated candidate default);
    # "auto": the quality-safe choice (= poly); "exact": XLA's sin
    # (see ops/fastmath.py and train/step.py:resolve_sin_impl)
    sin_impl: str = "poly"
    # "xla", "pallas" (fused VMEM-resident trunk kernel on TPU), or "auto"
    # (pick the measured-best engine from dtype + per-dispatch batch size,
    # see train/step.py:resolve_trunk_impl)
    trunk_impl: str = "xla"
    # pallas trunk backward: "recompute" | "stored" | "auto"
    # (see train/step.py:resolve_trunk_bwd and ops/pallas/trunk.py)
    trunk_bwd: str = "recompute"
    mapping_pos_n_freq: int = 10
    mapping_dir_n_freq: int = 4
    fc_use_full_features: bool = False
    epoch_subsampling_activated: bool = False
    epoch_subsampling: float = 1.0
    lr_scheduler: str = "step"
    compute_dtype: str = "float32"  # trunk GEMM dtype ("bfloat16" for speed)
    grad_accum: int = 1  # micro-batching factor (memory vs batch size)
    # chunked-scan remat: field eval in N sequential ray tiles with a
    # checkpointed scan body; unlocks large single-chip batches (the
    # backward peaks at one tile's activations). 0/1 disables.
    remat_chunks: int = 0

    @property
    def variant(self) -> str:
        return "nerf"

    @property
    def use_mapping(self) -> bool:
        # NeRF defaults to posenc+relu; sat variants default to raw-xyz SIREN
        # (ref model constructor defaults, see models/field.py docstring)
        return self.variant in ("nerf", "rs_semantic")


class SNeRFConfig(NeRFConfig):
    pipeline: str = "snerf"
    sc_lambda: float = 0.05
    # solar-correction quadrature stride: 1 = the reference's full-ladder
    # sun march; k>1 marches every k-th rung on the sc half only (the sc
    # terms read just the transmittance integral there). Cuts sc field
    # points by 1/k; opt-in behind the DSM-MAE quality gate
    # (docs/performance.md).
    sc_stride: int = 1

    @property
    def variant(self) -> str:
        return "snerf"


class SatNeRFConfig(SNeRFConfig):
    pipeline: str = "satnerf"
    depth_enabled: bool = True
    depth_supervision_drop: float = 0.25
    ds_lambda: float = 1000.0
    first_beta_epoch: int = 2
    # opt-in beta warm-up: mix the uncertainty losses in linearly over this
    # many epochs after first_beta_epoch instead of the reference's one-step
    # gate (0 = reference-exact). Mitigation for the small-batch beta
    # transient; see docs/validation_run.md "beta warm-up gate".
    beta_ramp_epochs: float = 0.0
    t_embedding_vocab: int = 50
    t_embedding_tau: int = 4
    ds_noweights: bool = False

    @property
    def variant(self) -> str:
        return "satnerf"


class RSSemanticConfig(SatNeRFConfig):
    pipeline: str = "rs_semantic"
    semantic_dataset_type: str = "own"
    lambda_s: float = 0.04
    sparsity_n_images: int = -1
    semantic_activation_function: str = "sigmoid"
    use_tj_for_s: bool = False
    use_tj_instead_of_beta: bool = False
    use_beta_for_s: bool = False
    detach_beta_for_s: bool = False
    use_separate_beta_for_s: bool = False
    use_separate_tj_for_semantic: bool = False
    ignore_car_index: bool = True
    use_car_reg_loss: bool = False
    car_reg_loss_start: int = 3
    lambda_c: float = 0.1

    @property
    def variant(self) -> str:
        return "rs_semantic"


PIPELINE_REGISTRY: dict[str, type[NeRFConfig]] = {
    "nerf": NeRFConfig,
    "snerf": SNeRFConfig,
    "satnerf": SatNeRFConfig,
    "rs_semantic": RSSemanticConfig,
    # reference dotted-path compatibility (ref TOMLs carry these strings)
    "baseline.pipelines.nerf.NerfPipeline": NeRFConfig,
    "baseline.pipelines.snerf.SNerfPipeline": SNeRFConfig,
    "baseline.pipelines.satnerf.SatNeRFPipeline": SatNeRFConfig,
    "semantic.pipelines.rs_semantic.RSSemanticPipeline": RSSemanticConfig,
}


# --------------------------------------------------------------------------
# main config bundle
# --------------------------------------------------------------------------


class MainConfig:
    """Bundle of run + pipeline configs (ref: framework/configs.py:65-143)."""

    def __init__(self, run: RunConfig, pipeline: NeRFConfig) -> None:
        self.run = run
        self.pipeline = pipeline

    def create_run_name(self) -> str:
        """Timestamped run name with ablation postfix.

        ref: framework/configs.py:98-127 + rs_semantic.py:143-175 postfixes.
        """
        stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
        name = f"{stamp}_{self.run.dataset_name}_{self.pipeline.variant}"
        name += _ablation_postfix(self.pipeline)
        if self.run.run_name_postfix:
            name += f"_{self.run.run_name_postfix}"
        return name

    def create_run_dp(self) -> str:
        if self.run.run_dp:  # already created (idempotent across CLI layers)
            return self.run.run_dp
        parts = [self.run.workspace_dp]
        if self.run.experiment_category:
            parts.append(f"_{self.run.experiment_category}")
        name = self.run.run_name or self.create_run_name()
        dp = os.path.join(*parts, name)
        # collision guard: timestamped names have 1 s resolution, and two
        # runs must never share checkpoints (the reference crashes instead)
        suffix = 0
        while True:
            try:
                os.makedirs(dp if not suffix else f"{dp}_{suffix}")
                break
            except FileExistsError:
                suffix += 1
        if suffix:
            name, dp = f"{name}_{suffix}", f"{dp}_{suffix}"
        self.run.run_name = name
        self.run.run_dp = dp
        return dp

    def dump(self, dp: str) -> None:
        """Persist both configs for later reload (ref: pipelines.py:58-61)."""
        os.makedirs(dp, exist_ok=True)
        write_toml(os.path.join(dp, "run.toml"), self.run.model_dump())
        write_toml(os.path.join(dp, "pipeline.toml"), self.pipeline.model_dump())


def _ablation_postfix(p: NeRFConfig) -> str:
    """Encode rs_semantic ablation flags into the run name.

    ref: semantic/pipelines/rs_semantic.py:143-175 (determine_run_name_postfix).
    """
    if not isinstance(p, RSSemanticConfig):
        return ""
    bits = []
    if p.semantic_dataset_type != "own":
        bits.append(p.semantic_dataset_type)
    if p.sparsity_n_images > 0:
        bits.append(f"sparsity{p.sparsity_n_images}")
    if p.use_tj_for_s:
        bits.append("tj_for_s")
    if p.use_tj_instead_of_beta:
        bits.append("tj_instead_of_beta")
    if p.use_beta_for_s:
        bits.append("beta_for_s")
    if p.detach_beta_for_s:
        bits.append("detach_beta")
    if p.use_separate_beta_for_s:
        bits.append("beta_s")
    if p.use_separate_tj_for_semantic:
        bits.append("tj_s")
    if p.use_car_reg_loss:
        bits.append(f"car_reg{p.lambda_c}")
    return ("_" + "_".join(bits)) if bits else ""


# --------------------------------------------------------------------------
# TOML IO
# --------------------------------------------------------------------------


def read_toml(fp: str) -> dict:
    with open(fp, "rb") as f:
        return tomllib.load(f)


def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        escaped = (
            v.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )
        return '"' + escaped + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise TypeError(f"cannot serialise {type(v)} to TOML")


def write_toml(fp: str, d: dict) -> None:
    lines = []
    for k, v in d.items():
        if v is None:
            continue
        lines.append(f"{k} = {_toml_value(v)}")
    with open(fp, "w") as f:
        f.write("\n".join(lines) + "\n")


# --------------------------------------------------------------------------
# loading (ref: framework/configs.py:146-197)
# --------------------------------------------------------------------------

_TEMPLATE = os.path.join(os.path.dirname(__file__), "run", "run_template.toml")


def load_configs(run_fp: str, pipeline_fp: str) -> MainConfig:
    """Load run + pipeline TOMLs; bootstrap a template if the run config is
    missing (ref: configs.py:153-164)."""
    if not os.path.isfile(run_fp):
        os.makedirs(os.path.dirname(run_fp) or ".", exist_ok=True)
        shutil.copy(_TEMPLATE, run_fp)
        logger.info(
            "Config",
            f"No run config found; template copied to {run_fp}. "
            "Edit it and re-run.",
        )
        raise SystemExit(0)

    run_d = read_toml(run_fp)
    pipe_d = read_toml(pipeline_fp)
    pipe_name = pipe_d.get("pipeline", "satnerf")
    if pipe_name not in PIPELINE_REGISTRY:
        raise KeyError(
            f"unknown pipeline {pipe_name!r} in {pipeline_fp}; "
            f"expected one of {'|'.join(sorted(PIPELINE_REGISTRY))}"
        )
    cls = PIPELINE_REGISTRY[pipe_name]
    run_d = {k: v for k, v in run_d.items() if k in RunConfig.model_fields}
    pipe_d = {k: v for k, v in pipe_d.items() if k in cls.model_fields}
    return MainConfig(RunConfig(**run_d), cls(**pipe_d))


def load_configs_from_logs(run_dp: str) -> MainConfig:
    """Reload the exact configs persisted into a run dir.

    ref: framework/configs.py:179-187.
    """
    cfg = load_configs(
        os.path.join(run_dp, "configs", "run.toml"),
        os.path.join(run_dp, "configs", "pipeline.toml"),
    )
    cfg.run.run_dp = run_dp
    return cfg


def adapt_configs_for_inference(cfg: MainConfig) -> MainConfig:
    """Inference-time tweaks (ref: framework/configs.py:190-197): no resume,
    deterministic sampling handled by the renderer)."""
    cfg.run.resume_from_ckpoint = False
    cfg.run.num_sanity_val_steps = 0
    return cfg
