"""Data layer: ASE codec round-trip, fixture DB parsing, Hamiltonian DB."""

from pathlib import Path

import numpy as np
import pytest

from nabladft_tpu.data.ase_codec import AseDatabase, AtomsRecord, decode_object, encode_object
from nabladft_tpu.data.dataset import (
    BucketedLoader,
    DataModule,
    EnergyDataset,
    LoaderConfig,
    assign_buckets,
    parse_energy_db,
    seeded_random_split,
)
from nabladft_tpu.data.hamiltonian_db import HamiltonianDatabase, HamiltonianRecord

pytestmark = pytest.mark.dataset


def test_blob_codec_roundtrip():
    obj = {
        "energy": [-6.5],
        "forces": np.random.default_rng(0).normal(size=(11, 3)),
        "nested": {"ints": np.arange(5, dtype=np.int32), "s": "x"},
    }
    out = decode_object(encode_object(obj))
    assert out["energy"] == [-6.5]
    np.testing.assert_array_equal(out["forces"], obj["forces"])
    np.testing.assert_array_equal(out["nested"]["ints"], obj["nested"]["ints"])


def test_read_reference_fixture(energy_db_path):
    """Parse the reference's committed 100-molecule fixture DB."""
    db = AseDatabase(energy_db_path)
    assert len(db) == 100
    rec = db.get(1)
    assert rec.natoms == 40
    assert rec.positions.shape == (40, 3)
    assert "energy" in rec.data and "forces" in rec.data
    assert rec.data["forces"].shape == (40, 3)
    assert rec.key_value_pairs["moses_id"] == 331314


def test_parse_energy_db_columns(energy_db_path, tmp_path):
    import shutil

    local = tmp_path / "db.db"
    shutil.copy(energy_db_path, local)
    recs = parse_energy_db(local)
    assert len(recs) == 100
    # reference asserts 4198 atoms over the 100 fixture molecules
    # (tests/dataset/test_lightning_datasets.py:33-36)
    assert recs.offsets[-1] == 4198
    assert np.isfinite(recs.energy).all()
    # cache hit path
    recs2 = parse_energy_db(local)
    np.testing.assert_array_equal(recs.z, recs2.z)


def test_ase_write_read_roundtrip(tmp_path):
    db = AseDatabase(tmp_path / "out.db", create=True)
    rec = AtomsRecord(
        numbers=np.array([6, 1, 1, 1, 1]),
        positions=np.random.default_rng(0).normal(size=(5, 3)),
        key_value_pairs={"moses_id": 7, "smiles": "C"},
        data={"energy": [-1.25], "forces": np.zeros((5, 3))},
    )
    rid = db.write(rec)
    back = db.get(rid)
    np.testing.assert_array_equal(back.numbers, rec.numbers)
    np.testing.assert_allclose(back.positions, rec.positions)
    assert back.key_value_pairs["moses_id"] == 7
    assert back.data["energy"] == [-1.25]


def test_hamiltonian_db_roundtrip(tmp_path):
    db = HamiltonianDatabase(tmp_path / "h.db", create=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        n, o = 4 + i, 10 + 2 * i
        h = rng.normal(size=(o, o)).astype(np.float32)
        db.add(
            HamiltonianRecord(
                z=np.array([6, 1, 1, 8, 7, 9][:n], np.int32),
                pos=rng.normal(size=(n, 3)).astype(np.float32),
                energy=-float(i) - 1,
                forces=rng.normal(size=(n, 3)).astype(np.float32),
                hamiltonian=h,
                overlap=np.eye(o, dtype=np.float32),
                core=h * 0.5,
                moses_id=100 + i,
                conformer_id=i,
            )
        )
    assert len(db) == 3
    rec = db.get(1)
    assert rec.natoms == 5 and rec.norb == 12
    assert rec.moses_id == 101
    db.add_orbitals(6, np.array([0, 0, 0, 1, 1, 2]))
    orbs = db.get_orbitals(6)
    np.testing.assert_array_equal(orbs, [0, 0, 0, 1, 1, 2])
    assert db.orbital_counts()[6] == 3 * 1 + 2 * 3 + 5


def test_hamiltonian_db_rejects_nan(tmp_path):
    db = HamiltonianDatabase(tmp_path / "h.db", create=True)
    with pytest.raises(ValueError):
        db.add(
            HamiltonianRecord(
                z=np.array([1], np.int32),
                pos=np.array([[np.nan, 0, 0]], np.float32),
                energy=0.0,
                forces=np.zeros((1, 3), np.float32),
                hamiltonian=np.zeros((1, 1), np.float32),
                overlap=np.zeros((1, 1), np.float32),
                core=np.zeros((1, 1), np.float32),
            )
        )


def test_bucketing_and_loader(energy_db_path, tmp_path):
    import shutil

    local = tmp_path / "db.db"
    shutil.copy(energy_db_path, local)
    ds = EnergyDataset(str(local), bucket_boundaries=(32, 48, 64))
    assert (ds.bucket_of >= 0).all()
    loader = BucketedLoader(ds, config=LoaderConfig(batch_size=16, shuffle=True, seed=1))
    seen = 0
    for batch in loader:
        b, a = batch.z.shape
        assert b == 16 and a in (32, 48, 64)
        n_real = int(batch.graph_mask.sum())
        seen += n_real
        # atom counts fit the bucket and masks are consistent
        assert (batch.node_mask.sum(-1)[batch.graph_mask] <= a).all()
        assert (batch.z[~batch.node_mask] == 0).all()
        assert np.isfinite(batch.energy).all()
    assert seen == 100


def test_assign_buckets_drops_oversize():
    out = assign_buckets(np.array([10, 33, 64, 65]), (32, 64))
    np.testing.assert_array_equal(out, [0, 1, 1, -1])


def test_seeded_split_deterministic():
    a1, b1 = seeded_random_split(100, [0.9, 0.1], seed=7)
    a2, b2 = seeded_random_split(100, [0.9, 0.1], seed=7)
    np.testing.assert_array_equal(a1, a2)
    assert len(a1) == 90 and len(b1) == 10
    assert not set(a1) & set(b1)


def test_datamodule(energy_db_path, tmp_path):
    import shutil

    local = tmp_path / "db.db"
    shutil.copy(energy_db_path, local)
    dm = DataModule(EnergyDataset(str(local)), batch_size=8, val_fraction=0.2)
    n_train = sum(int(b.graph_mask.sum()) for b in dm.train_dataloader())
    n_val = sum(int(b.graph_mask.sum()) for b in dm.val_dataloader())
    assert n_train == 80 and n_val == 20


def test_multifile_energy_dataset(energy_db_path, tmp_path):
    import shutil

    a, b = tmp_path / "a.db", tmp_path / "b.db"
    shutil.copy(energy_db_path, a)
    shutil.copy(energy_db_path, b)
    ds = EnergyDataset([str(a), str(b)])
    assert len(ds) == 200
    assert ds.records.offsets[-1] == 2 * 4198


def test_extxyz_writer(tmp_path, rng):
    from nabladft_tpu.utils.xyz import write_extxyz

    z = np.array([6, 1, 1])
    frames = [rng.normal(size=(3, 3)), rng.normal(size=(3, 3))]
    p = tmp_path / "traj.extxyz"
    write_extxyz(p, z, frames, energies=[-1.0, -2.0])
    lines = p.read_text().splitlines()
    assert lines[0] == "3"
    assert "energy=" in lines[1]
    assert lines[2].startswith("C ")
    assert len(lines) == 2 * 5


def test_energy_cache_streams_and_memmaps(tmp_path):
    """parse_energy_db writes a per-column .npy cache in bounded chunks and
    loads it memory-mapped (VERDICT r1 weak #6: the 20.4 GB full split must
    not be RAM-resident). Correctness: cached == direct parse."""
    import resource

    import numpy as np

    from nabladft_tpu.data.ase_codec import AseDatabase, AtomsRecord
    from nabladft_tpu.data.dataset import parse_energy_db

    rng = np.random.default_rng(0)
    db_path = tmp_path / "stream.db"
    db = AseDatabase(db_path, create=True)
    for i in range(400):
        n = int(rng.integers(5, 30))
        db.write(AtomsRecord(
            numbers=rng.integers(1, 17, n).astype(np.int32),
            positions=rng.normal(size=(n, 3)).astype(np.float64),
            pbc=0, key_value_pairs={},
            data={"energy": [float(i)], "forces": rng.normal(size=(n, 3))},
        ))

    direct = parse_energy_db(db_path, cache=False)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    cached = parse_energy_db(db_path, cache=True)  # builds streamed cache
    assert (db_path.with_suffix(".cache") / "pos.npy").exists()
    assert isinstance(cached.z, np.memmap) and isinstance(cached.pos, np.memmap)
    for col in ("z", "pos", "energy", "forces", "offsets", "row_ids"):
        np.testing.assert_array_equal(
            np.asarray(getattr(cached, col)), np.asarray(getattr(direct, col)),
            err_msg=col,
        )
    # reload hits the cache (memmapped again)
    again = parse_energy_db(db_path, cache=True)
    assert isinstance(again.energy, np.memmap)
    # RSS sanity: building + mapping a cache must not grow the heap by more
    # than a few file sizes (generous bound; the win matters at 20 GB scale)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert (rss1 - rss0) * 1024 < 50 * 1024 * 1024, (rss0, rss1)


def test_energy_cache_readonly_dir_fallback(tmp_path, energy_db_path, monkeypatch):
    """DBs in non-writable directories must load without cache writes
    (root ignores chmod, so simulate the EROFS at the mkdir call)."""
    import shutil
    from pathlib import Path

    from nabladft_tpu.data.dataset import parse_energy_db

    ro = tmp_path / "ro"
    ro.mkdir()
    shutil.copy(energy_db_path, ro / "db.db")
    orig_mkdir = Path.mkdir

    def deny(self, *a, **k):
        if self.suffix == ".cache":
            raise OSError(30, "Read-only file system")
        return orig_mkdir(self, *a, **k)

    monkeypatch.setattr(Path, "mkdir", deny)
    recs = parse_energy_db(ro / "db.db", cache=True)
    assert len(recs) == 100
    assert not (ro / "db.cache").exists()


def test_loader_num_workers_deterministic(energy_db_path):
    """Multi-worker collation yields the SAME batches in the SAME order as
    the single-thread path (the pool only parallelizes collation)."""
    ds = EnergyDataset(str(energy_db_path))
    mk = lambda nw: BucketedLoader(
        ds, config=LoaderConfig(batch_size=16, shuffle=True, seed=3, num_workers=nw)
    )
    ref = list(mk(1))
    par = list(mk(4))
    assert len(ref) == len(par) > 0
    for b1, b2 in zip(ref, par):
        np.testing.assert_array_equal(np.asarray(b1.z), np.asarray(b2.z))
        np.testing.assert_array_equal(np.asarray(b1.pos), np.asarray(b2.pos))
        np.testing.assert_array_equal(
            np.asarray(b1.graph_mask), np.asarray(b2.graph_mask)
        )


def test_external_db_cache_never_writes_beside_source(energy_db_path, tmp_path, monkeypatch):
    """A source DB outside the datasets root / cwd (e.g. the read-only
    reference fixture mount) must get its .cache under root, not next to
    the DB — as root, permission bits would not stop the write."""
    import shutil

    ext = tmp_path / "elsewhere"
    ext.mkdir()
    shutil.copy(energy_db_path, ext / "fixture.db")
    work = tmp_path / "work"
    work.mkdir()
    monkeypatch.chdir(work)
    ds = EnergyDataset(str(ext / "fixture.db"), root=str(work / "datasets"))
    assert len(ds.records) == 100
    assert not (ext / "fixture.cache").exists()
    caches = list((work / "datasets" / "cache").glob("fixture-*.cache"))
    assert len(caches) == 1
    # second load hits the same cache (keyed by resolved path)
    ds2 = EnergyDataset(str(ext / "fixture.db"), root=str(work / "datasets"))
    assert len(ds2.records) == 100
    assert list((work / "datasets" / "cache").glob("fixture-*.cache")) == caches
