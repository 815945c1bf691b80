"""NanoVDB .nvdb binary format tests (VERDICT r1 missing #2).

Round-trips synthesized .nvdb files through utils/nvdb (writer <-> reader,
both codecs), and drives the full ingestion leg: `nanovdb2pbrt foo.nvdb`
emits a `uniformgrid` parameter block that parses and renders (reference:
cmd/nanovdb2pbrt.cpp + media.cpp:488-500).
"""
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.utils import nvdb


def _sparse_grid(seed=0, shape=(20, 30, 40), origin=(5, -3, 2)):
    rs = np.random.RandomState(seed)
    dense = np.zeros(shape, np.float32)
    dense[3:12, 5:25, 10:35] = rs.rand(9, 20, 25).astype(np.float32)
    dense[dense < 0.4] = 0.0        # force empty leaves to be pruned
    vs = 0.1
    lo = np.array(origin, np.float64) * vs
    hi = lo + np.array(shape[::-1], np.float64) * vs
    return nvdb.NvdbGrid(
        name="density", data=dense, index_min=origin,
        world_bbox=np.stack([lo, hi]), voxel_size=np.full(3, vs))


@pytest.mark.parametrize("codec", ["none", "zip"])
def test_nvdb_roundtrip(tmp_path, codec):
    g = _sparse_grid()
    p = str(tmp_path / "t.nvdb")
    nvdb.write_nvdb(p, g, codec=codec)
    r = nvdb.read_nvdb(p)
    assert r.name == "density" and r.is_fog_volume
    assert r.index_min == g.index_min
    assert np.array_equal(r.data, g.data)
    assert np.allclose(r.voxel_size, g.voxel_size)
    assert np.allclose(r.world_bbox, g.world_bbox)
    if codec == "zip":
        # sparsity must actually compress
        import os
        assert os.path.getsize(p) < g.data.nbytes / 4


def test_nvdb_multigrid_and_selection(tmp_path):
    g = _sparse_grid()
    g2 = nvdb.NvdbGrid(name="temperature", data=g.data * 2.0,
                       index_min=g.index_min, world_bbox=g.world_bbox,
                       voxel_size=g.voxel_size)
    p = str(tmp_path / "m.nvdb")
    nvdb.write_nvdb(p, [g, g2], codec="zip")
    assert nvdb.list_grids(p) == ["density", "temperature"]
    t = nvdb.read_nvdb(p, "temperature")
    assert np.array_equal(t.data, g.data * 2.0)
    with pytest.raises(KeyError):
        nvdb.read_nvdb(p, "velocity")


def test_nvdb_negative_origin_multiple_root_tiles(tmp_path):
    """A grid straddling a 4096^3 root-key boundary exercises multiple
    root tiles and the 21-bit key sign extension."""
    d = np.ones((4, 4, 16), np.float32)
    g = nvdb.NvdbGrid(name="density", data=d, index_min=(-8, 0, 0),
                      world_bbox=np.array([[-0.8, 0, 0], [0.8, 0.4, 0.4]]),
                      voxel_size=np.full(3, 0.1))
    p = str(tmp_path / "n.nvdb")
    nvdb.write_nvdb(p, g)
    r = nvdb.read_nvdb(p)
    assert r.data.shape == d.shape
    assert np.array_equal(r.data, d)


def test_nvdb_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nvdb"
    p.write_bytes(b"not a nanovdb file at all........")
    with pytest.raises(ValueError, match="magic"):
        nvdb.read_nvdb(str(p))


def test_nanovdb2pbrt_nvdb_to_render(tmp_path):
    """The full ingestion leg: synthesize .nvdb -> converter CLI ->
    uniformgrid block -> .pbrt scene -> parse -> render finite image."""
    from acceleratedvolrenderer_tpu.cli import nanovdb2pbrt as conv
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene.parser import load_scene

    # smooth blob density in a unit-ish box
    n = 24
    z, y, x = np.meshgrid(*(np.linspace(-1, 1, n),) * 3, indexing="ij")
    dense = np.exp(-4.0 * (x**2 + y**2 + z**2)).astype(np.float32) * 3.0
    dense[dense < 0.05] = 0.0
    vs = 1.0 / n
    g = nvdb.NvdbGrid(
        name="density", data=dense, index_min=(0, 0, 0),
        world_bbox=np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]),
        voxel_size=np.full(3, vs))
    nv = str(tmp_path / "blob.nvdb")
    nvdb.write_nvdb(nv, g, codec="zip")

    block = str(tmp_path / "grid.pbrt")
    assert conv.main([nv, "-o", block]) == 0
    text = open(block).read()
    # reference prints dims = indexBBox extent + 2 (the <= max+1 loop)
    assert f'"integer nx" {n + 1}' in text
    assert '"point3 p0" [ 0.000000 0.000000 0.000000 ]' in text

    scene_txt = f'''
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
Sampler "independent" "integer pixelsamples" [4]
Integrator "volpath" "integer maxdepth" [5]
WorldBegin
LightSource "distant" "rgb L" [3 3 3] "point3 from" [0 5 0] "point3 to" [0.5 0.5 0.5]
AttributeBegin
MakeNamedMedium "cloud" "string type" "uniformgrid"
    "rgb sigma_a" [0.2 0.2 0.2] "rgb sigma_s" [1.5 1.5 1.5]
    {text}
MediumInterface "cloud" ""
Material ""
Shape "sphere" "float radius" [10]
AttributeEnd
'''
    f = tmp_path / "s.pbrt"
    f.write_text(scene_txt)
    sc = load_scene(str(f))
    assert sc.medium is not None and sc.medium.density is not None
    assert sc.medium.density.shape == (n + 1, n + 1, n + 1)
    img, _ = render_mod.render(sc)
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_blosc_codec_roundtrip():
    """BLOSC chunk codec (utils/blosc.py): LZ4 + byte shuffle roundtrip,
    plus raw-split and memcpy paths."""
    import numpy as np

    from acceleratedvolrenderer_tpu.utils import blosc

    rng = np.random.default_rng(0)
    # compressible float data (smooth field) exercises LZ4 matches
    data = np.sin(np.linspace(0, 20, 5000)).astype(np.float32).tobytes()
    for ts, shuf in [(4, True), (4, False), (1, False)]:
        chunk = blosc.compress(data, typesize=ts, do_shuffle=shuf)
        assert blosc.decompress(chunk) == data
    # incompressible data takes the raw-split path
    noise = rng.bytes(3000)
    assert blosc.decompress(blosc.compress(noise, typesize=4)) == noise
    # multi-block
    big = (np.arange(100000, dtype=np.uint32) % 251).astype(np.uint8).tobytes()
    chunk = blosc.compress(big, typesize=4, blocksize=1 << 14)
    assert blosc.decompress(chunk) == big
    # memcpy flag
    memcpy = bytes([2, 1, blosc.FLAG_MEMCPY, 1]) + \
        np.uint32(5).tobytes() + np.uint32(5).tobytes() + \
        np.uint32(21).tobytes() + b"hello"
    assert blosc.decompress(memcpy) == b"hello"


def test_lz4_block_format():
    """LZ4 block decoder handles overlapping matches (RLE-style)."""
    from acceleratedvolrenderer_tpu.utils import blosc

    data = b"abcabcabcabcabcabcabcabcXYZ" * 10 + b"tail-bytes"
    comp = blosc.lz4_compress_block(data)
    assert len(comp) < len(data)
    assert blosc.lz4_decompress_block(comp, len(data)) == data


def test_lz4_native_python_interop():
    """The native block codec (native/lz4.cpp) and the pure-Python
    executable spec decode each other's output byte-exactly."""
    import numpy as np
    import pytest

    from acceleratedvolrenderer_tpu import native
    from acceleratedvolrenderer_tpu.utils import blosc

    if not native.is_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"short",
        np.sin(np.linspace(0, 30, 1 << 16)).astype(np.float32).tobytes(),
        rng.integers(0, 3, 50000, np.uint8).tobytes(),  # high-match-rate
        rng.bytes(50000),                               # incompressible
    ]
    for data in cases:
        c_nat = native.lz4_compress_block(data)
        c_py = blosc._lz4_compress_block_py(data)
        assert native.lz4_decompress_block(c_py, len(data)) == data
        assert blosc._lz4_decompress_block_py(c_nat, len(data)) == data
        assert native.lz4_decompress_block(c_nat, len(data)) == data
    # malformed input raises, not crashes
    with pytest.raises(ValueError):
        native.lz4_decompress_block(b"\xff\xff\xff", 100)


def test_nvdb_blosc_grid_roundtrip(tmp_path):
    """A BLOSC-compressed .nvdb written by our writer reads back
    bit-exactly (the WDAS-export ingestion path, media.cpp:488-500)."""
    import numpy as np

    from acceleratedvolrenderer_tpu.utils import nvdb

    rng = np.random.default_rng(3)
    dens = (rng.random((24, 20, 16)) < 0.3).astype(np.float32) * \
        rng.random((24, 20, 16)).astype(np.float32)
    path = str(tmp_path / "cloud_blosc.nvdb")
    g_in = nvdb.NvdbGrid(
        name="density", data=dens, index_min=(0, 0, 0),
        world_bbox=np.array([[0, 0, 0], [1.0, 1.25, 1.5]]),
        voxel_size=np.array([1 / 16, 1 / 16, 1 / 16]))
    nvdb.write_nvdb(path, g_in, codec="blosc")
    g = nvdb.read_nvdb(path, "density")
    np.testing.assert_array_equal(np.asarray(g.data), dens)
