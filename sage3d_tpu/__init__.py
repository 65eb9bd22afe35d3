"""sage3d_tpu: TPU-native framework for physically executable 3DGS navigation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of SAGE-3D
("Towards Physically Executable 3D Gaussian for Embodied Navigation"): a
differentiable 3D Gaussian splatting renderer (RGB + depth + semantic-ID,
forward + analytic backward) with capsule collision queries replaces the Isaac
Sim / PhysX engine; the SAGE-Bench VLN benchmark (environment, 5 task types,
13 metrics, data pipeline, policy-server protocol) runs on top of it; scenes,
pixels and Gaussian parameters shard across TPU meshes.

Public surface mirrors the reference package exports
(environment_evaluation/__init__.py:9-81) so downstream code ports directly.
"""

__version__ = "0.1.0"

from .bench.episodes import adapt_gvln_to_episodes  # noqa: F401
from .bench.measures import MeasureManager, default_measures, nogoal_measures  # noqa: F401
from .bench.runner import run_benchmark, run_episode  # noqa: F401
from .bench.success import ObjectBasedSuccessEvaluator  # noqa: F401
from .bench.tasks import TaskTypeManager, adapt_episode_for_task  # noqa: F401
from .env.vln_env import GaussianVLNEnv  # noqa: F401
from .physics.occupancy import OccupancyGrid, grid_from_semantic_map  # noqa: F401
from .renderer.camera import Camera, agent_camera, make_camera, stack_cameras  # noqa: F401
from .renderer.render import render, render_batch  # noqa: F401
from .renderer.scene import GaussianScene, load_ply, make_scene, save_ply, synthetic_room  # noqa: F401
from .serve.client import ModularVLMClient, create_vlm_client, query_vlm  # noqa: F401

# Alias kept for direct portability from the reference package
# (`from environment_evaluation import SimpleVLNEnv` -> same role here).
SimpleVLNEnv = GaussianVLNEnv
SemanticMap2DCollisionDetector = OccupancyGrid
