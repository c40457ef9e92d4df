"""Byte-level `.vdb` fixtures hand-assembled from the OpenVDB format spec.

The round-trip tests in `test_vdb_native.py` check the reader against the
repo's own writer, so a *shared* misreading of the format passes them
(and round 2 shipped exactly that: both sides gated the per-node int8
metadata code on COMPRESS_ACTIVE_MASK, while OpenVDB emits it for every
stream at file version >= 222 - `io/Compression.h writeCompressedValues`:
``if (!maskCompress) os.write(&metadata, 1)``).

These fixtures are assembled byte-by-byte in this file directly from the
serialization code of the OpenVDB library itself (the format's de-facto
spec; layout citations inline), never via ``volume/vdb_write.py``, and
cover the file-version matrix (220 / 222 / 224), half-float payloads,
tile values, every mask-compression metadata code, and both zip chunk
encodings.  A fuzz pass then checks the decoder errors (never crashes)
on truncated and bit-flipped variants.

No real OpenVDB-library-written file is obtainable in this environment
(zero egress, no pyopenvdb, the reference ships no sample volumes), so
hand-assembly from the library's own read/write code is the strongest
available independence from the repo writer.

Spec sources (all in OpenVDB's public headers/sources):
  - header/descriptor: io/Archive.cc readHeader, io/GridDescriptor.cc
  - node topology:     tree/RootNode.h, tree/InternalNode.h readTopology
  - leaf buffers:      tree/LeafNode.h readBuffers/writeBuffers
  - value payloads:    io/Compression.h readCompressedValues/readData
"""

import struct
import subprocess
import sys
import zlib

import numpy as np
import pytest

try:
    from isosurfacesuperresolution_tpu.native import vdbio
except (OSError, subprocess.CalledProcessError):  # no g++/zlib
    vdbio = None

pytestmark = pytest.mark.skipif(vdbio is None,
                                reason="native vdbio not buildable")

MAGIC = 0x56444220            # int64(' BDV'), little-endian
ZIP, MASK = 0x1, 0x2          # COMPRESS_ZIP, COMPRESS_ACTIVE_MASK


def B(*chunks):
    return b"".join(chunks)


def s(txt):                   # io::writeString: u32 length + bytes
    b = txt.encode()
    return struct.pack("<I", len(b)) + b


def mask_bytes(bits):
    """NodeMask::save: the raw bit array, 64-bit words, bit i = offset i
    (z fastest within a node: offset = x<<2L | y<<L | z)."""
    bits = np.asarray(bits, bool)
    n_words = (bits.size + 63) // 64
    words = np.zeros(n_words, np.uint64)
    idx = np.nonzero(bits)[0]
    np.bitwise_or.at(words, idx // 64,
                     (np.uint64(1) << (idx % 64).astype(np.uint64)))
    return words.tobytes()


def payload(vals, compression, half):
    """io::readData: raw array, or (ZIP) int64 chunk size + zlib bytes,
    negative size = incompressible-stored-raw."""
    raw = np.asarray(vals, np.float16 if half else np.float32).tobytes()
    if not compression & ZIP:
        return raw
    comp = zlib.compress(raw)
    if len(comp) < len(raw):
        return struct.pack("<q", len(comp)) + comp
    return struct.pack("<q", -len(raw)) + raw


def payload_raw_chunk(vals, half=False):
    """ZIP-mode chunk forced to the negative-count raw encoding."""
    raw = np.asarray(vals, np.float16 if half else np.float32).tobytes()
    return struct.pack("<q", -len(raw)) + raw


def compressed_values(vals, value_mask, compression, half, version=224,
                      code=None, inactive=(), selection=None):
    """io::writeCompressedValues stream for one node.

    For version >= 222 the int8 metadata code is ALWAYS first, even with
    mask compression off.  With mask compression on and code != 6, only
    the countOn(value_mask) values are stored; codes 2/4/5 store one or
    two inactive values as FULL floats (never half); codes 3/4/5 store a
    selection mask."""
    vals = np.asarray(vals, np.float32)
    value_mask = np.asarray(value_mask, bool)
    out = []
    if version >= 222:
        if code is None:
            code = 0 if compression & MASK else 6
        out.append(struct.pack("<b", code))
        for v in inactive:
            out.append(struct.pack("<f", v))      # full ValueType always
        if selection is not None:
            out.append(mask_bytes(selection))
        stored = vals[value_mask] if (compression & MASK and code != 6) \
            else vals
    else:
        stored = vals
    out.append(payload(stored, compression, half))
    return B(*out)


def uniform_scale_map(scale):
    """math::ScaleMap::write: mScaleValues, mVoxelSize,
    mScaleValuesInverse, mInvScaleSqr, mInvTwiceScale (5 x Vec3d)."""
    v = [scale] * 3
    inv = [1.0 / scale] * 3
    return B(s("UniformScaleMap"),
             struct.pack("<3d", *v), struct.pack("<3d", *v),
             struct.pack("<3d", *inv),
             struct.pack("<3d", *[x * x for x in inv]),
             struct.pack("<3d", *[0.5 * x for x in inv]))


def leaf_topology(active):
    """LeafNode::writeTopology: value mask only (512 bits)."""
    return mask_bytes(active)


def leaf_buffer(vals, active, compression, half, version=224, code=None,
                inactive=(), selection=None):
    """LeafNode::writeBuffers: the value mask AGAIN, then (pre-222) the
    origin + int8 numBuffers, then the compressed values."""
    out = [mask_bytes(active)]
    if version < 222:
        out.append(struct.pack("<iii", 0, 0, 0))  # mOrigin (ignored)
        out.append(struct.pack("<b", 1))          # numBuffers
    out.append(compressed_values(vals, active, compression, half,
                                 version=version, code=code,
                                 inactive=inactive, selection=selection))
    return B(*out)


def internal_topology(log2, child_offsets, compression, half, version=224,
                      tile_vals=None, tile_active_offsets=()):
    """InternalNode::writeTopology: child mask, value mask, the value
    table via writeCompressedValues (pre-222: only the childMask-off
    values, in offset order), then children follow.

    ``tile_vals``: dict offset -> value for (in)active tiles."""
    n = 1 << (3 * log2)
    cmask = np.zeros(n, bool)
    cmask[list(child_offsets)] = True
    vmask = np.zeros(n, bool)
    vmask[list(tile_active_offsets)] = True
    vals = np.zeros(n, np.float32)
    for off, v in (tile_vals or {}).items():
        vals[off] = v
    if version >= 222:
        body = compressed_values(vals, vmask, compression, half,
                                 version=version)
    else:
        body = payload(vals[~cmask], compression, half)
    return B(mask_bytes(cmask), mask_bytes(vmask), body)


def child_offset(log2, cx, cy, cz):
    return (cx << (2 * log2)) | (cy << log2) | cz


def assemble(version, compression, topology, buffers, half=False,
             grid_name="density", voxel=1.0, global_compressed=False):
    """io::Archive file: header, grid descriptors, grid blocks."""
    grid_type = "Tree_float_5_4_3" + ("_HalfFloat" if half else "")
    tree = B(struct.pack("<I", 1),         # TreeBase buffer count
             topology)
    grid = []
    if version >= 222:
        grid.append(struct.pack("<I", compression))  # per-grid flags
    grid.append(struct.pack("<I", 0))      # empty metadata map
    grid.append(uniform_scale_map(voxel))
    grid = B(*grid)

    header = [struct.pack("<q", MAGIC), struct.pack("<I", version),
              struct.pack("<II", 5, 0),    # library major/minor
              b"\x01"]                     # hasGridOffsets
    if 220 <= version < 222:
        header.append(b"\x01" if global_compressed else b"\x00")
    if version >= 218:
        header.append(b"0123456789abcdef0123456789abcdef0123")  # uuid[36]
    header.append(struct.pack("<I", 1))    # grid count
    header = B(*header)

    desc_fixed = B(s(grid_name), s(grid_type), s(""))  # + 3 x i64
    grid_pos = len(header) + len(desc_fixed) + 24
    block_pos = grid_pos + len(grid) + len(tree)
    end_pos = block_pos + len(buffers)
    return B(header, desc_fixed,
             struct.pack("<qqq", grid_pos, block_pos, end_pos),
             grid, tree, buffers)


def single_leaf_file(version, compression, vals, active, half=False,
                     voxel=1.0, code=None, inactive=(), selection=None,
                     global_compressed=False):
    """One 8^3 leaf at the origin under Internal5(0,0,0)->Internal4."""
    root = B(struct.pack("<f", 0.0),       # background
             struct.pack("<II", 0, 1),     # tiles, children
             struct.pack("<iii", 0, 0, 0))
    topo = B(root,
             internal_topology(5, [0], compression, half, version),
             internal_topology(4, [0], compression, half, version),
             leaf_topology(active))
    buf = leaf_buffer(vals, active, compression, half, version=version,
                      code=code, inactive=inactive, selection=selection)
    return assemble(version, compression, topo, buf, half=half,
                    voxel=voxel, global_compressed=global_compressed)


def leaf_vals(seed=3, active_prob=0.5):
    rng = np.random.RandomState(seed)
    active = rng.rand(512) > (1 - active_prob)
    active[0] = True                        # keep bbox = the full leaf...
    active[511] = True                      # ...for easy comparison
    vals = np.where(active, rng.rand(512).astype(np.float32) + 0.25,
                    0.0).astype(np.float32)
    return vals, active


def decode(tmp_path, blob, name="f.vdb"):
    p = tmp_path / name
    p.write_bytes(blob)
    dense, vox = vdbio.load(str(p))
    return dense, vox


def dense_from_leaf(vals, active):
    """Expected dense output: active values, background (0) elsewhere,
    over the leaf's 8^3 bbox; offset packs z fastest."""
    out = np.where(active, vals, 0.0).astype(np.float32)
    return out.reshape(8, 8, 8)            # (x, y, z), z fastest


# ------------------------------------------------------------- decoding --


@pytest.mark.parametrize("version", [222, 224])
@pytest.mark.parametrize("compression", [0, ZIP, ZIP | MASK, MASK])
def test_leaf_decode_version_compression_matrix(tmp_path, version,
                                                compression):
    vals, active = leaf_vals(seed=version + compression)
    blob = single_leaf_file(version, compression, vals, active)
    dense, vox = decode(tmp_path, blob)
    np.testing.assert_array_equal(dense, dense_from_leaf(vals, active))
    assert vox == (1.0, 1.0, 1.0)


def test_v224_uncompressed_stream_still_has_metadata_byte(tmp_path):
    """The round-2 bug this suite exists for: with compression == NONE at
    version >= 222 the int8 code (6) is still present before the raw
    512-value payload.  A decoder that skips it reads the payload 1 byte
    early and garbles every value."""
    vals, active = leaf_vals(seed=9)
    blob = single_leaf_file(224, 0, vals, active)
    # sanity: the leaf buffer section is mask(64) + code(1) + 512 floats
    dense, _ = decode(tmp_path, blob)
    np.testing.assert_array_equal(dense, dense_from_leaf(vals, active))


def test_half_payload_with_full_float_inactive_value(tmp_path):
    """_HalfFloat grids store bulk values as f16 but explicit inactive
    values as FULL floats (readCompressedValues reads sizeof(ValueT))."""
    vals, active = leaf_vals(seed=5)
    blob = single_leaf_file(224, ZIP | MASK, vals, active, half=True,
                            code=2, inactive=(0.125,))
    dense, _ = decode(tmp_path, blob)
    exp = dense_from_leaf(vals.astype(np.float16).astype(np.float32),
                          active)
    np.testing.assert_allclose(dense, exp, atol=1e-3)


def test_zip_negative_count_raw_chunk(tmp_path):
    """A ZIP-mode chunk with a negative byte count is stored raw."""
    vals, active = leaf_vals(seed=7)
    stored = vals[active]
    buf = B(mask_bytes(active), struct.pack("<b", 0),
            payload_raw_chunk(stored))
    root = B(struct.pack("<f", 0.0), struct.pack("<II", 0, 1),
             struct.pack("<iii", 0, 0, 0))
    topo = B(root, internal_topology(5, [0], ZIP | MASK, False),
             internal_topology(4, [0], ZIP | MASK, False),
             leaf_topology(active))
    blob = assemble(224, ZIP | MASK, topo, buf)
    dense, _ = decode(tmp_path, blob)
    np.testing.assert_array_equal(dense, dense_from_leaf(vals, active))


@pytest.mark.parametrize("code,inactive,with_selection", [
    (0, (), False),                        # inactive == +background
    (1, (), False),                        # inactive == -background
    (2, (0.125,), False),                  # one stored inactive value
    (3, (), True),                         # mask selects +/- background
    (4, (0.125,), True),                   # background vs one stored
    (5, (0.125, 0.875), True),             # two stored inactive values
    (6, (), False),                        # no mask compression
])
def test_metadata_codes_consume_exact_bytes(tmp_path, code, inactive,
                                            with_selection):
    """Two leaves: the first written with each metadata code, the second
    with sentinel actives.  If the decoder mis-consumes the code's
    inactive values or selection mask, the second leaf's payload
    desyncs and the sentinel comparison fails."""
    rng = np.random.RandomState(40 + code)
    a1 = rng.rand(512) > 0.5
    a1[:2] = True
    v1 = np.where(a1, rng.rand(512).astype(np.float32) + 0.25, 0.0)
    v1 = v1.astype(np.float32)
    sel = (rng.rand(512) > 0.5) & ~a1 if with_selection else None
    a2 = np.zeros(512, bool)
    a2[[0, 17, 511]] = True
    v2 = np.zeros(512, np.float32)
    v2[[0, 17, 511]] = [2.5, -3.25, 7.75]  # sentinels

    comp = ZIP | MASK
    # leaves at (0,0,0) and (8,0,0): two children of one Internal4 node
    i4 = internal_topology(4, [child_offset(4, 0, 0, 0),
                               child_offset(4, 1, 0, 0)], comp, False)
    root = B(struct.pack("<f", 0.0), struct.pack("<II", 0, 1),
             struct.pack("<iii", 0, 0, 0))
    topo = B(root, internal_topology(5, [0], comp, False), i4,
             leaf_topology(a1), leaf_topology(a2))
    buf = B(leaf_buffer(v1, a1, comp, False, code=code,
                        inactive=inactive, selection=sel),
            leaf_buffer(v2, a2, comp, False))
    blob = assemble(224, comp, topo, buf)
    dense, _ = decode(tmp_path, blob)
    assert dense.shape == (16, 8, 8)
    np.testing.assert_array_equal(dense[:8], dense_from_leaf(v1, a1))
    np.testing.assert_array_equal(dense[8:], dense_from_leaf(v2, a2))


def test_v220_legacy_layout(tmp_path):
    """File version 220: global header compression byte, NO metadata
    codes anywhere, internal nodes store only the childMask-off values,
    and leaf buffer sections carry origin + numBuffers."""
    vals, active = leaf_vals(seed=20)
    blob = single_leaf_file(220, 0, vals, active, global_compressed=False)
    dense, _ = decode(tmp_path, blob)
    np.testing.assert_array_equal(dense, dense_from_leaf(vals, active))
    # and the zip variant via the global compressed flag
    blob = single_leaf_file(220, ZIP, vals, active, global_compressed=True)
    dense, _ = decode(tmp_path, blob)
    np.testing.assert_array_equal(dense, dense_from_leaf(vals, active))


def test_internal_tile_values(tmp_path):
    """An active tile at the Internal4 level (span 8) fills its whole
    span with the tile value alongside a sibling leaf."""
    comp = ZIP | MASK
    vals, active = leaf_vals(seed=31)
    tile_off = child_offset(4, 1, 0, 0)    # spans voxels x in [8,16)
    i4 = internal_topology(4, [child_offset(4, 0, 0, 0)], comp, False,
                           tile_vals={tile_off: 0.625},
                           tile_active_offsets=[tile_off])
    root = B(struct.pack("<f", 0.0), struct.pack("<II", 0, 1),
             struct.pack("<iii", 0, 0, 0))
    topo = B(root, internal_topology(5, [0], comp, False), i4,
             leaf_topology(active))
    blob = assemble(224, comp, topo,
                    leaf_buffer(vals, active, comp, False))
    dense, _ = decode(tmp_path, blob)
    assert dense.shape == (16, 8, 8)
    np.testing.assert_array_equal(dense[:8], dense_from_leaf(vals, active))
    np.testing.assert_array_equal(dense[8:], np.full((8, 8, 8), 0.625,
                                                     np.float32))


def test_inactive_root_tile_is_ignored(tmp_path):
    """Root tiles (span 4096) with active=false contribute nothing."""
    comp = ZIP | MASK
    vals, active = leaf_vals(seed=33)
    root = B(struct.pack("<f", 0.0),
             struct.pack("<II", 1, 1),     # one tile, one child
             struct.pack("<iii", 4096, 0, 0), struct.pack("<f", 9.0),
             b"\x00",                      # inactive
             struct.pack("<iii", 0, 0, 0))
    topo = B(root, internal_topology(5, [0], comp, False),
             internal_topology(4, [0], comp, False), leaf_topology(active))
    blob = assemble(224, comp, topo,
                    leaf_buffer(vals, active, comp, False))
    dense, _ = decode(tmp_path, blob)
    assert dense.shape == (8, 8, 8)
    np.testing.assert_array_equal(dense, dense_from_leaf(vals, active))


def test_voxel_size_transforms(tmp_path):
    vals, active = leaf_vals(seed=41)
    blob = single_leaf_file(224, ZIP | MASK, vals, active, voxel=0.125)
    p = tmp_path / "v.vdb"
    p.write_bytes(blob)
    bbox, vox = vdbio.probe(str(p))
    assert vox == (0.125, 0.125, 0.125)
    assert tuple(bbox) == (0, 0, 0, 7, 7, 7)


def test_rejects_unsupported(tmp_path):
    vals, active = leaf_vals(seed=50)
    # blosc compression flag
    blob = single_leaf_file(224, 0x4 | MASK, vals, active)
    with pytest.raises(OSError, match="[Bb]losc|unsupported"):
        decode(tmp_path, blob, "blosc.vdb")
    # pre-220 version
    blob = single_leaf_file(224, ZIP | MASK, vals, active)
    blob = blob[:8] + struct.pack("<I", 219) + blob[12:]
    with pytest.raises(OSError):
        decode(tmp_path, blob, "old.vdb")
    # wrong magic
    blob = single_leaf_file(224, ZIP | MASK, vals, active)
    blob = b"\x00" * 8 + blob[8:]
    with pytest.raises(OSError):
        decode(tmp_path, blob, "magic.vdb")


# ----------------------------------------------------------------- fuzz --


FUZZ_DRIVER = r"""
import struct, sys
import numpy as np
from isosurfacesuperresolution_tpu.native import vdbio

blob = open(sys.argv[1], 'rb').read()
tmp = sys.argv[1] + '.fuzz'
n_err = n_ok = 0
def attempt(b):
    global n_err, n_ok
    open(tmp, 'wb').write(b)
    try:
        vdbio.probe(tmp)
        vdbio.load(tmp)
        n_ok += 1
    except Exception:
        n_err += 1

# truncation at every offset in the header/descriptor region and a
# stride through the node/payload region
for cut in list(range(0, min(len(blob), 160))) + \
        list(range(160, len(blob), 7)):
    attempt(blob[:cut])
# single-byte corruption sweep (stride) + random multi-byte flips
rng = np.random.RandomState(0)
for off in range(0, len(blob), 11):
    b = bytearray(blob); b[off] ^= 0xff
    attempt(bytes(b))
for _ in range(300):
    b = bytearray(blob)
    for off in rng.randint(0, len(blob), rng.randint(1, 8)):
        b[off] = rng.randint(256)
    attempt(bytes(b))
print("fuzz ok", n_err, n_ok)
"""


def test_fuzz_truncation_and_corruption_never_crashes(tmp_path):
    """Every truncated/corrupted variant must either decode or raise -
    the decoder must never segfault or hang.  Runs in a subprocess so a
    crash fails this test instead of killing the pytest process."""
    vals, active = leaf_vals(seed=60)
    blob = single_leaf_file(224, ZIP | MASK, vals, active)
    src = tmp_path / "seed.vdb"
    src.write_bytes(blob)
    drv = tmp_path / "fuzz.py"
    drv.write_text(FUZZ_DRIVER)
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run([sys.executable, str(drv), str(src)],
                       capture_output=True, text=True, timeout=600,
                       env=env, cwd="/root/repo")
    assert r.returncode == 0, f"fuzz driver died:\n{r.stdout}\n{r.stderr}"
    assert "fuzz ok" in r.stdout
