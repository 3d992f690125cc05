"""Native tar-shard reader (native/tar_reader.cpp + data/native_tar.py):
must yield byte-identical samples to the tarfile path, zero-copy decode
included, and wan_synth must route through it transparently."""
import io
import os
import tarfile

import numpy as np
import pytest

from interpolated_diffusion_tpu.data.native_tar import (
    iter_tar_samples_native, native_tar_available,
)
from interpolated_diffusion_tpu.data.wan_synth import (
    SyntheticWanDataset, iter_tar_samples, write_tar_shard,
)

pytestmark = pytest.mark.skipif(not native_tar_available(),
                                reason="native tar lib did not build")


def _shard(tmp_path, n=6):
    ds = SyntheticWanDataset(n_samples=n, T=5, C=4, H=8, W=8, text_len=3,
                             text_dim=16, seed=0)
    p = os.path.join(str(tmp_path), "s_00000.tar")
    write_tar_shard(p, [{"__key__": f"{i:08d}", **ds.get(i)}
                        for i in range(n)])
    return p


def _tarfile_read(path):
    out, cur, samp = [], None, {}
    with tarfile.open(path) as tf:
        for m in tf:
            if not m.isfile():
                continue
            base = os.path.basename(m.name)
            parts = base.split(".")
            if len(parts) < 3 or parts[-1] != "npy":
                continue
            key, field = ".".join(parts[:-2]), parts[-2]
            if cur is not None and key != cur and samp:
                out.append({"__key__": cur, **samp})
                samp = {}
            cur = key
            samp[field] = np.load(io.BytesIO(tf.extractfile(m).read()),
                                  allow_pickle=False)
        if samp:
            out.append({"__key__": cur, **samp})
    return out


def test_native_matches_tarfile(tmp_path):
    p = _shard(tmp_path)
    nat = list(iter_tar_samples_native(p))
    ref = _tarfile_read(p)
    assert len(nat) == len(ref) == 6
    for a, b in zip(nat, ref):
        assert a["__key__"] == b["__key__"]
        assert set(a) == set(b)
        for k in a:
            if k == "__key__":
                continue
            assert a[k].dtype == b[k].dtype
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_wan_synth_routes_native(tmp_path, monkeypatch):
    p = _shard(tmp_path)
    nat = list(iter_tar_samples(p))          # routed through native
    monkeypatch.setenv("IDT_NATIVE_TAR", "0")
    import interpolated_diffusion_tpu.data.native_tar as nt

    monkeypatch.setattr(nt, "_lib", None)
    monkeypatch.setattr(nt, "_tried", False)
    fb = list(iter_tar_samples(p))           # tarfile fallback
    assert len(nat) == len(fb)
    for a, b in zip(nat, fb):
        for k in a:
            if k == "__key__":
                continue
            np.testing.assert_array_equal(a[k], b[k])


def test_native_long_member_names(tmp_path):
    """Keys long enough to force PAX/GNU longname entries must round-trip."""
    key = "k" * 120  # name + '.latents.npy' > 100 chars → extended header
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    p = os.path.join(str(tmp_path), "long.tar")
    write_tar_shard(p, [{"__key__": key, "latents": arr}])
    samples = list(iter_tar_samples_native(p))
    assert len(samples) == 1
    assert samples[0]["__key__"] == key
    np.testing.assert_array_equal(samples[0]["latents"], arr)
