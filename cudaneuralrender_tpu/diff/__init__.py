"""Differentiable rendering (BASELINE config 4).

The reference is inference-only (SURVEY.md §0); this subpackage makes the
renderer trainable end-to-end: implicit-function pixel gradients
(``implicit``), losses (``losses``), optimizer steps (``train``), and the
staged-scheduler surface solve that makes the grad step run at inference-
fast-path speed (``solve``).
"""
from .implicit import implicit_surface_t, render_depth_diff, render_image_diff
from .losses import (
    eikonal_loss,
    pixel_loss,
    pixel_loss_packed,
    sdf_distillation_loss,
    silhouette_loss,
)
from .solve import solve_surface, solve_surface_async, solve_surface_packed_async
from .train import (
    TrainState,
    fit_sdf,
    init_train_state,
    load_train_state,
    save_train_state,
    pixel_train_step,
    pixel_train_step_fast,
    sdf_train_step,
    train_loop_fast,
)

__all__ = [
    "TrainState",
    "eikonal_loss",
    "fit_sdf",
    "implicit_surface_t",
    "init_train_state",
    "load_train_state",
    "save_train_state",
    "pixel_loss",
    "pixel_loss_packed",
    "pixel_train_step",
    "pixel_train_step_fast",
    "render_depth_diff",
    "render_image_diff",
    "sdf_distillation_loss",
    "sdf_train_step",
    "silhouette_loss",
    "solve_surface",
    "solve_surface_async",
    "solve_surface_packed_async",
    "train_loop_fast",
]
