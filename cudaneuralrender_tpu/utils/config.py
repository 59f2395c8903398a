"""Render configuration.

TPU-native replacement for the reference's scattered configuration state:
compile-time march constants (reference: src/volumeRender_kernel.cu:57-61),
CUDA ``__constant__`` memory settings (src/volumeRender_kernel.cu:31-35,
copyStaticSettings src/volumeRender_kernel.cu:702-706) and the hand-rolled CLI
defaults (src/main.cpp:557-631).

On TPU there is no constant-memory "config bus": the config is a frozen,
hashable dataclass passed as a jit-static argument, so XLA specializes the
compiled program on it (resolution, step budget, scene, shading mode are all
static shapes / static control flow).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings (hashable -> usable as jax.jit static arg).

    Defaults mirror the reference renderer's operating point:
      * 512x512 default resolution      (src/main.cpp:576-586)
      * MAX_STEPS=6000                  (src/volumeRender_kernel.cu:61)
      * MARCHING_EPSILON=1e-6           (src/volumeRender_kernel.cu:60)
      * NORMAL_EPSILON=1e-5             (src/volumeRender_kernel.cu:59)
      * bounding sphere r=1.2 at origin (src/volumeRender_kernel.cu:325-328)
      * focal length -2 ray z           (src/volumeRender_kernel.cu:321)
    """

    width: int = 512
    height: int = 512

    # Sphere-trace budget / tolerances.
    max_steps: int = 6000
    march_eps: float = 1e-6
    normal_eps: float = 1e-5

    # Scene bounding sphere (empty-space culling before marching).
    bound_center: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    bound_radius: float = 1.2

    # Camera projection: rays leave the eye through (u, v, -focal).
    focal: float = 2.0

    # Scene composition applied around the raw neural SDF logit.
    # "neural_raw" reproduces the reference's checked-in behavior of using the
    # network's pre-tanh output directly as a distance
    # (quirk documented at src/volumeRender_kernel.cu:217-230 via simpleInfer.cpp:109).
    scene: str = "neural_raw"

    # "facing" (c_coloringType==0) or "matcap" (==1), src/volumeRender_kernel.cu:446-453.
    shading: str = "facing"

    # Surface-normal estimator: "autodiff" (jax.grad of the SDF — exact, the
    # TPU-native default) or "tetrahedron" (4-tap finite difference, parity
    # with src/volumeRender_kernel.cu:362-377).
    normal_mode: str = "autodiff"

    # 3 = (x, y, z); 4 = (x, y, z, frame) animation mode
    # (c_numInputs, src/volumeRender_kernel.cu:34, createBatch :533-544).
    num_inputs: int = 3

    # March loop implementation:
    #   "while"   - lax.while_loop, exits as soon as every ray resolved (fast inference)
    #   "fori"    - fixed-length unrolled-scan march (reverse-differentiable)
    #   "staged"  - multi-stage compaction: re-gathers the active rays into a
    #               smaller dense batch every `stage_steps` steps (host-synced,
    #               like the reference's per-step compaction but amortized)
    march_impl: str = "while"
    stage_steps: int = 64

    # Compute dtype for MLP matmuls. Positions/distances always stay float32
    # (march_eps=1e-6 is far below bf16 resolution).
    mlp_dtype: str = "float32"

    # Use the Pallas fused march megakernel when available.
    use_pallas: bool = False

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.height, self.width)

    @property
    def num_rays(self) -> int:
        return self.height * self.width

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    def validate(self) -> "RenderConfig":
        if self.scene not in SCENE_NAMES:
            raise ValueError(f"unknown scene {self.scene!r}; choose from {sorted(SCENE_NAMES)}")
        if self.shading not in ("facing", "matcap"):
            raise ValueError(f"unknown shading {self.shading!r}")
        if self.normal_mode not in ("autodiff", "tetrahedron"):
            raise ValueError(f"unknown normal_mode {self.normal_mode!r}")
        if self.march_impl not in ("while", "fori", "staged"):
            raise ValueError(f"unknown march_impl {self.march_impl!r}")
        if self.num_inputs not in (3, 4):
            raise ValueError("num_inputs must be 3 or 4")
        return self


# Scene registry names (implementations live in ops/sdf.py).
SCENE_NAMES = frozenset(
    {
        "neural_raw",        # raw network logit as distance (reference checked-in behavior)
        "neural_tanh",       # tanh(logit) as distance (the reference's intended plain path)
        "many_sphere",       # smooth-union of 9 animated spheres with the neural SDF
        "many_sphere_cut",   # smooth-subtraction variant
        "many_cylinder_cut", # 300-cylinder drill pattern
        "displacement",      # sine displacement of tanh(logit)
        "sphere",            # analytic sphere only (no network) — for tests
    }
)
