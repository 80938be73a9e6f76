"""Configuration system: dataclass groups + auto-generated CLI + saved-config merge.

Behavioral reference: /root/reference/arguments/__init__.py:19-158. The same
three groups (model/pipeline/optimization) with the same names, defaults and
shorthand flags; training dumps `cfg_args` and downstream apps re-merge saved
config under CLI overrides (get_combined_args semantics). Implemented with
dataclasses + argparse reflection instead of the reference's __dict__ scraping.
"""
from __future__ import annotations

import dataclasses
import json
import os
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field, fields


# Fields whose CLI flag also gets a single-letter shorthand, like the
# reference's leading-underscore convention (arguments/__init__.py:23-33).
_SHORTHAND = {"source_path": "-s", "model_path": "-m", "images": "-i",
              "resolution": "-r", "white_background": "-w"}


@dataclass
class ModelConfig:
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    # GS-IR
    gamma: bool = False
    metallic: bool = False
    # GS-2M
    material: bool = False
    mask_gt: bool = False
    masks: str = ""
    depths: str = ""


@dataclass
class PipelineConfig:
    convert_SHs_python: bool = False   # kept for CLI parity; JAX always computes SH in-graph
    compute_cov3D_python: bool = False
    z_depth: bool = False
    debug: bool = False
    # TPU-specific knobs (no reference equivalent):
    tile: int = 16                      # pixel tile edge for binning
    chunk: int = 256                    # Gaussians per blend chunk
    # Instance buffer ~ mult * capacity (+ per-tile alignment floor). Every
    # sort/gather/kernel cost scales with this STATIC cap, and 8M+ caps have
    # hung remote compiles — start lean; binning overflow doubles it on
    # demand (trainer._grow_instance_cap), and the ellipse-tile cull keeps
    # the real load well under the rect-expansion estimate.
    instance_cap_mult: float = 4.0
    use_pallas: bool = True             # False -> pure-XLA blend (golden-equivalent)
    # Backward compaction (pair path): run the blend backward + segmented
    # reduce only on non-terminated chunks (exact — terminated chunks have
    # identically-zero grads). The Trainer sizes the static bwd cap from the
    # measured per-step demand (pkg["bwd_live"]) with headroom and grows it
    # on overflow like the binning cap. Early training (small splats, deep
    # overlap) drops ~50% of backward index-space work (measured r5 probe).
    compact_bwd: bool = True
    # Binning-time guaranteed-termination cut (ops/binning.bin_gaussians
    # term_cut): 4x4-block conservative alpha bounds cut each tile's depth
    # tail where every pixel's T < 1e-4 is guaranteed — output- and
    # gradient-exact, captures ~83%% of the exactly-dead slots on opaque
    # scenes. Shrinks the ALIGNED demand the instance cap covers, so the
    # Trainer splits the caps (expand_cap for the pre-cut side) and SHRINKS
    # instance_cap from the measured aligned demand. Off by default until
    # the on-chip A/B lands (see BASELINE round-5 rows).
    term_cut: bool = False


@dataclass
class OptimConfig:
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.001
    lambda_ssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    opacity_prune_threshold: float = 0.005
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    # AbsGS
    densify_grad_abs_threshold: float = 0.0008
    use_opacity_reduce: bool = False
    opacity_reduce_interval: int = 500
    prune_init_points: bool = True
    radii2D_threshold: float = 20
    # PGSR multi-view
    multi_view_num: int = 8
    multi_view_ncc_weight: float = 0.15
    multi_view_geo_weight: float = 2e-3
    multi_view_ncc_scale: float = -1.0
    multi_view_max_angle: float = 30
    multi_view_min_dist: float = 0.01
    multi_view_max_dist: float = 1.5
    use_multi_view_trim: bool = True
    multi_view_sample_num: int = 102400
    multi_view_patch_size: int = 3
    # GS-2M staging & material
    geometry_from_iter: int = 5000
    material_from_iter: int = 30_000
    lambda_alpha: float = 0.2
    lambda_plane: float = 100.0
    lambda_depth_normal: float = 0.03
    lambda_multi_view: float = 1.0
    lambda_normal: float = 0.1
    lambda_smooth: float = 0.0
    lambda_rough: float = 1e-4
    mv_angle_threshold: float = 30
    mv_angle_factor: float = 2.0
    mv_occlusion_threshold: float = 5e-4
    mv_geo_weight_decay: float = 3.0
    reflection_threshold: float = 1.0
    nearby_cam_num: int = 16
    nearby_cam_max_angle: float = 60
    nearby_cam_min_angle: float = 10
    nearby_cam_min_dist: float = 0.05
    nearby_cam_max_dist: float = 2.5


_GROUPS = {"model": ModelConfig, "pipeline": PipelineConfig, "optim": OptimConfig}


def add_group_args(parser: ArgumentParser, cls, fill_none: bool = False) -> None:
    for f in fields(cls):
        flag = "--" + f.name
        names = [flag] + ([_SHORTHAND[f.name]] if f.name in _SHORTHAND else [])
        default = None if fill_none else f.default
        if f.type in (bool, "bool"):
            # BooleanOptionalAction adds --flag / --no-flag pairs so defaults
            # of True (e.g. use_pallas) can be disabled from the CLI.
            from argparse import BooleanOptionalAction
            parser.add_argument(*names, default=default,
                                action=BooleanOptionalAction)
        else:
            typ = {int: int, float: float, str: str,
                   "int": int, "float": float, "str": str}[f.type]
            parser.add_argument(*names, default=default, type=typ)


def extract_group(args: Namespace, cls):
    kwargs = {}
    for f in fields(cls):
        v = getattr(args, f.name, None)
        if v is None:
            v = f.default
        kwargs[f.name] = v
    cfg = cls(**kwargs)
    if isinstance(cfg, ModelConfig) and cfg.source_path:
        cfg.source_path = os.path.abspath(cfg.source_path)
    return cfg


def save_cfg_args(model_path: str, model: ModelConfig, pipeline: PipelineConfig,
                  optim: OptimConfig) -> None:
    """Persist the merged config next to the model (utils/training_utils.py:27-28
    writes `cfg_args`; we use JSON instead of repr-eval for safety)."""
    os.makedirs(model_path, exist_ok=True)
    blob = {
        "model": dataclasses.asdict(model),
        "pipeline": dataclasses.asdict(pipeline),
        "optim": dataclasses.asdict(optim),
    }
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(blob, f, indent=2)


def load_cfg_args(model_path: str):
    path = os.path.join(model_path, "cfg_args.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        blob = json.load(f)
    return (ModelConfig(**blob["model"]), PipelineConfig(**blob["pipeline"]),
            OptimConfig(**blob["optim"]))


def combine_args(parser: ArgumentParser, argv=None):
    """CLI-over-saved-config merge (arguments/__init__.py:139-158): values the
    user typed win; everything else comes from the saved cfg_args.json."""
    args = parser.parse_args(argv)
    saved = load_cfg_args(args.model_path) if getattr(args, "model_path", None) else None
    model = extract_group(args, ModelConfig)
    pipeline = extract_group(args, PipelineConfig)
    optim = extract_group(args, OptimConfig)
    if saved is not None:
        s_model, s_pipe, s_opt = saved
        for cfg, scfg in ((model, s_model), (pipeline, s_pipe), (optim, s_opt)):
            for f in fields(cfg):
                if getattr(args, f.name, None) is None and hasattr(scfg, f.name):
                    setattr(cfg, f.name, getattr(scfg, f.name))
    return args, model, pipeline, optim
