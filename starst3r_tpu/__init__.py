"""starst3r_tpu — TPU-native 3D reconstruction + novel-view synthesis.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Starst3r
(see SURVEY.md): MASt3R-style pairwise ViT pointmap + descriptor regression,
reciprocal-NN matching, incremental sparse global alignment over a keyframe
pose graph, and 3D Gaussian Splatting training — designed for single-chip
through multi-host TPU pod slices.

Public API mirrors the reference's flat surface
(reference: starster/__init__.py:1-9) so user scripts translate 1:1.
"""

from .version import __version__

from .config import (
    Config, ImageConfig, ModelConfig, MatchingConfig, GAConfig, SplatConfig,
    SceneConfig, MeshConfig, default_config, model_preset,
)
from .imaging import (
    make_pair_indices, make_sliding_window_pairs, process_image, load_image,
    load_images, image_to_uint8,
)
from .utils import (
    interp_se3, interp_se3_path, se3_inverse, se3_apply,
    quat_to_rotmat, rotmat_to_quat,
    save_pytree, restore_pytree,
)
from .ops import ssim, psnr

# Heavier subsystems are imported lazily-but-eagerly here; they only depend
# on jax so the import cost is parsing.
from . import models  # noqa: E402
from .models import Mast3rModel  # reference-compat alias
from .reconstruct import reconstruct_scene
from .scene import Scene
from . import splat as gs  # reference-compat: `starster.gs`
from .splat import init_3dgs, render_3dgs, render_3dgs_original, run_3dgs_optim
