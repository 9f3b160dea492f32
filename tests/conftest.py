"""Test harness: run everything on an 8-device virtual CPU mesh.

The reference gates multi-device tests on 2 physical GPUs
(tests/pipeline/test_pipeline.py:16-20). JAX lets us do better: forcing the
host platform to expose 8 virtual CPU devices gives real SPMD coverage on
any machine. Must be set before jax initializes.
"""

import os

# jax may already be imported by the interpreter's sitecustomize hook (axon
# environments), so plain env vars are too late; jax.config still works as
# long as no backend has been initialized yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

TESTS_DIR = Path(__file__).parent
REPO_DIR = TESTS_DIR.parent
# The reference repo's committed fixture DBs (pure data, read-only).
REFERENCE_FIXTURES = Path("/root/reference/tests/data/raw")


def _fixture_copy(name: str, tmp_root: Path) -> Path:
    """Session-scoped tmp copy: the framework may write sidecar caches next
    to a DB; the reference tree must stay pristine."""
    src = REFERENCE_FIXTURES / name
    if not src.exists():
        pytest.skip("reference fixture DB not available")
    dst = tmp_root / name
    if not dst.exists():
        import shutil

        shutil.copy(src, dst)
    return dst


@pytest.fixture(scope="session")
def energy_db_path(tmp_path_factory) -> Path:
    return _fixture_copy("test_database.db", tmp_path_factory.mktemp("fixtures"))


@pytest.fixture(scope="session")
def optim_db_path(tmp_path_factory) -> Path:
    return _fixture_copy("test_optim_database.db", tmp_path_factory.mktemp("fixtures"))


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


def random_molecule(rng, n_atoms: int, box: float = 6.0):
    """A random well-separated molecule for numeric tests."""
    z = rng.integers(1, 17, size=n_atoms).astype(np.int32)
    pos = rng.uniform(-box / 2, box / 2, size=(n_atoms, 3)).astype(np.float32)
    return z, pos


@pytest.fixture()
def small_batch(rng):
    """A MolBatch of 4 random molecules padded to 16 atoms (1 padding mol)."""
    from nabladft_tpu.data.batch import MolBatch

    B, A = 4, 16
    z = np.zeros((B, A), np.int32)
    pos = np.zeros((B, A, 3), np.float32)
    node_mask = np.zeros((B, A), bool)
    graph_mask = np.zeros((B,), bool)
    for i, n in enumerate([16, 9, 12]):
        zi, pi = random_molecule(rng, n)
        z[i, :n] = zi
        pos[i, :n] = pi
        node_mask[i, :n] = True
        graph_mask[i] = True
    energy = rng.normal(size=(B,)).astype(np.float32) * graph_mask
    forces = rng.normal(size=(B, A, 3)).astype(np.float32) * node_mask[..., None]
    return MolBatch(
        z=z, pos=pos, node_mask=node_mask, graph_mask=graph_mask,
        energy=energy, forces=forces, mol_id=np.arange(B, dtype=np.int32),
    )
