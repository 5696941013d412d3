"""LMDB format fuzzing + structural invariants (no liblmdb in this env).

The from-scratch reader/writer (parseq_tpu/data/lmdb.py) previously only
round-tripped against itself on friendly workloads. These tests attack the
format edges a real liblmdb file exercises:

- page-boundary node sizes (inline-vs-overflow threshold, exactly-full pages)
- overflow values spanning 1..many pages, including exact page multiples
- key shapes: 1 byte .. MDB_MAXKEYSIZE=511, long shared prefixes, 0x00/0xFF
  bytes, adjacent keys differing in the last byte (memcmp ordering)
- tree depth >= 3 (branch-of-branch), single-record and empty databases

plus an independent structural validator that re-derives every invariant the
liblmdb reader relies on (meta geometry, per-page header sanity, 2-byte node
alignment, in-page key sort order, branch separator = min key of child
subtree, overflow page counts, meta entry/page statistics).

Residual risk (documented): no golden file authored by real liblmdb exists
offline, so a shared misunderstanding of the spec in both reader and writer
would pass. The validator narrows that: it is written against the LMDB 0.9
struct layout (MDB_meta/MDB_db/MDB_page/MDB_node) independently of the
reader's descent logic.
"""

import random
import struct

import pytest

from parseq_tpu.data.lmdb import (
    LmdbError, LmdbReader, LmdbWriter, MAGIC, NODE_HDR, PAGE_HDR, PAGE_SIZE,
    P_BRANCH, P_INVALID, P_LEAF, P_META, P_OVERFLOW, F_BIGDATA)


# --------------------------------------------------------------- validator ---


def validate_structure(path):
    """Re-derive LMDB 0.9 invariants from raw bytes, independent of LmdbReader."""
    raw = open(path if str(path).endswith('.mdb') else f'{path}/data.mdb', 'rb').read()
    assert len(raw) % PAGE_SIZE == 0 and len(raw) >= 2 * PAGE_SIZE

    def page_hdr(pgno):
        off = pgno * PAGE_SIZE
        p, _pad, flags, lower, upper = struct.unpack_from('<QHHHH', raw, off)
        return p, flags, lower, upper

    # -- meta pages
    metas = []
    for pgno in (0, 1):
        p, flags, _, _ = page_hdr(pgno)
        assert p == pgno and flags & P_META
        m = pgno * PAGE_SIZE + PAGE_HDR
        magic, version = struct.unpack_from('<II', raw, m)
        assert magic == MAGIC and version == 1
        # MDB_meta head: magic(4) version(4) address(8) mapsize(8) = 24 bytes,
        # then mm_dbs[2] (48 bytes each: FREE_DBI, MAIN_DBI), last_pg, txnid.
        main = struct.unpack_from('<IHHQQQQQ', raw, m + 24 + 48)
        last_pg, txnid = struct.unpack_from('<QQ', raw, m + 24 + 96)
        metas.append((txnid, main, last_pg))
    txnid, main, last_pg = max(metas)
    _pad, _flags, depth, n_branch, n_leaf, n_overflow, entries, root = main
    assert (last_pg + 1) * PAGE_SIZE == len(raw), 'last_pg must match file size'

    if root == P_INVALID:
        assert entries == 0 and depth == 0 == n_branch == n_leaf == n_overflow
        return {'entries': 0, 'depth': 0}

    seen_entries = 0
    counted = {'branch': 0, 'leaf': 0, 'overflow': 0}
    max_depth = 0

    def walk(pgno, level, lo_bound):
        """Returns the minimum key of the subtree. lo_bound: keys must be > it."""
        nonlocal seen_entries, max_depth
        p, flags, lower, upper = page_hdr(pgno)
        assert p == pgno, f'page {pgno} header stores pgno {p}'
        assert PAGE_HDR <= lower <= upper <= PAGE_SIZE
        n = (lower - PAGE_HDR) >> 1
        assert n >= 1
        off = pgno * PAGE_SIZE
        min_key = None
        prev_key = None
        for i in range(n):
            (ptr,) = struct.unpack_from('<H', raw, off + PAGE_HDR + 2 * i)
            assert ptr % 2 == 0, 'nodes must be 2-byte aligned'
            assert upper <= ptr < PAGE_SIZE
            nlo, nhi, nflags, ksize = struct.unpack_from('<HHHH', raw, off + ptr)
            key = raw[off + ptr + NODE_HDR : off + ptr + NODE_HDR + ksize]
            if flags & P_BRANCH:
                assert ksize == 0 if i == 0 else ksize >= 1, 'branch entry 0 has empty key'
                child = nlo | (nhi << 16) | (nflags << 32)
                assert 2 <= child <= last_pg
                child_min = walk(child, level + 1, prev_key)
                if i > 0:
                    assert key == child_min, (
                        f'branch separator {key!r} != child min key {child_min!r}')
                eff = key if i > 0 else child_min
                if min_key is None:
                    min_key = eff
                if prev_key is not None and i > 0:
                    assert key > prev_key, 'branch keys must be strictly sorted'
                prev_key = eff
            else:
                assert flags & P_LEAF
                assert 1 <= ksize <= 511
                seen_entries += 1
                dsize = nlo | (nhi << 16)
                if nflags & F_BIGDATA:
                    (ovpg,) = struct.unpack_from('<Q', raw, off + ptr + NODE_HDR + ksize)
                    op, oflags, _, _ = page_hdr(ovpg)
                    assert op == ovpg and oflags & P_OVERFLOW
                    (pb_pages,) = struct.unpack_from('<I', raw, ovpg * PAGE_SIZE + 12)
                    assert pb_pages == (dsize + PAGE_HDR + PAGE_SIZE - 1) // PAGE_SIZE
                    assert ovpg + pb_pages - 1 <= last_pg
                    counted['overflow'] += pb_pages
                else:
                    assert ptr + NODE_HDR + ksize + dsize <= PAGE_SIZE
                if min_key is None:
                    min_key = key
                if prev_key is not None:
                    assert key > prev_key, 'leaf keys must be strictly sorted'
                prev_key = key
        if flags & P_BRANCH:
            counted['branch'] += 1
        else:
            counted['leaf'] += 1
            max_depth = max(max_depth, level + 1)
        return min_key

    walk(root, 0, None)
    assert seen_entries == entries, f'meta says {entries} entries, tree has {seen_entries}'
    assert counted['branch'] == n_branch
    assert counted['leaf'] == n_leaf
    assert counted['overflow'] == n_overflow
    assert max_depth == depth, f'meta depth {depth} != tree depth {max_depth}'
    return {'entries': entries, 'depth': depth, **counted}


def roundtrip(tmp_path, kv, name='db'):
    path = tmp_path / name
    with LmdbWriter(path) as w:
        for k, v in kv.items():
            w.put(k, v)
    stats = validate_structure(path)
    with LmdbReader(path) as r:
        assert len(r) == len(kv)
        for k, v in kv.items():
            got = r.get(k)
            assert got == v, f'key {k!r}: wrote {len(v)}B, read {None if got is None else len(got)}B'
        assert list(r.items()) == sorted(kv.items())
        # missing keys (mutations of real ones) return None
        rng = random.Random(0)
        for k in list(kv)[:50]:
            probe = k + b'\x00'
            if probe not in kv:
                assert r.get(probe) is None
            if len(k) > 1:
                probe = k[:-1]
                if probe not in kv:
                    assert r.get(probe) is None
    return stats


# -------------------------------------------------------------- edge cases ---


def test_inline_overflow_threshold_boundary(tmp_path):
    """Value sizes bracketing the inline limit and page multiples."""
    key = b'k' * 8
    sizes = set()
    for base in (0, 1, 2, 100, 2000, 2010, 2020, 2022, 2023, 2024, 2030,
                 PAGE_SIZE - PAGE_HDR, PAGE_SIZE, 2 * PAGE_SIZE - PAGE_HDR,
                 2 * PAGE_SIZE, 5 * PAGE_SIZE + 1):
        for d in (-1, 0, 1):
            if base + d >= 0:
                sizes.add(base + d)
    kv = {b'%s%06d' % (key, s): bytes((s + i) % 256 for i in range(s))
          for s in sorted(sizes)}
    roundtrip(tmp_path, kv)


def test_key_shapes(tmp_path):
    """1..511-byte keys, shared prefixes, 0x00/0xFF bytes, memcmp ordering."""
    kv = {}
    kv[b'\x00'] = b'nul'
    kv[b'\xff' * 511] = b'max'
    kv[b'a' * 511] = b'longa'
    kv[b'a' * 510 + b'b'] = b'longb'
    for i in range(256):
        kv[bytes([i]) + b'\x00' * 3] = b'v%d' % i
    prefix = b'p' * 300
    for i in range(64):
        kv[prefix + bytes([i])] = prefix + b'=%d' % i
    roundtrip(tmp_path, kv)


def test_key_size_validation(tmp_path):
    w = LmdbWriter(tmp_path / 'db')
    with pytest.raises(LmdbError):
        w.put(b'', b'v')
    with pytest.raises(LmdbError):
        w.put(b'k' * 512, b'v')
    w.put(b'k' * 511, b'v')  # boundary ok


def test_empty_and_single(tmp_path):
    assert roundtrip(tmp_path, {}, 'empty')['entries'] == 0
    roundtrip(tmp_path, {b'only': b'x' * 10}, 'single')


def test_deep_tree(tmp_path):
    """Force depth >= 3: enough 511-byte keys that branches split too."""
    kv = {b'%0507d-' % i + b'kkk': b'v%d' % i for i in range(600)}
    stats = roundtrip(tmp_path, kv)
    assert stats['depth'] >= 3
    assert stats['branch'] > 1  # branch level itself split


def test_exactly_full_leaf_packing(tmp_path):
    """Nodes sized so leaves fill to the last even byte."""
    # node = 8 + klen + vlen; with klen=8 choose vlen so need = even(node)+2
    # divides the 4080-byte usable area exactly: node 1018, need 1020, 4 per page.
    vlen = 1018 - NODE_HDR - 8
    kv = {b'%08d' % i: bytes(vlen) for i in range(40)}
    stats = roundtrip(tmp_path, kv)
    assert stats['leaf'] == 10  # 4 nodes per page exactly


# ------------------------------------------------------------------- fuzz ---


def _random_kv(rng, n):
    kv = {}
    while len(kv) < n:
        shape = rng.random()
        if shape < 0.5:
            klen = rng.randint(1, 16)
        elif shape < 0.8:
            klen = rng.randint(17, 64)
        else:
            klen = rng.randint(65, 511)
        k = rng.randbytes(klen)
        vshape = rng.random()
        if vshape < 0.4:
            vlen = rng.randint(0, 64)
        elif vshape < 0.7:
            vlen = rng.randint(1900, 2100)  # straddle the inline threshold
        elif vshape < 0.9:
            vlen = rng.randint(2100, 3 * PAGE_SIZE)
        else:
            vlen = rng.choice([PAGE_SIZE - PAGE_HDR - 1, PAGE_SIZE - PAGE_HDR,
                               PAGE_SIZE, 4 * PAGE_SIZE, rng.randint(0, 8 * PAGE_SIZE)])
        kv[k] = rng.randbytes(vlen)
    return kv


@pytest.mark.parametrize('seed', range(16))
def test_fuzz_roundtrip(tmp_path, seed):
    rng = random.Random(seed)
    n = rng.choice([1, 2, 3, 17, 150, 800, 3000])
    kv = _random_kv(rng, n)
    roundtrip(tmp_path, kv, f'fuzz{seed}')


def test_fuzz_native_reader_agrees(tmp_path):
    """The C++ reader must agree with the Python reader on fuzzed DBs."""
    from parseq_tpu.data.native import NativeLmdbReader, load

    if load() is None:
        pytest.skip('native reader not built')
    rng = random.Random(1234)
    kv = _random_kv(rng, 300)
    path = tmp_path / 'db'
    with LmdbWriter(path) as w:
        for k, v in kv.items():
            w.put(k, v)
    with NativeLmdbReader(path) as nat, LmdbReader(path) as py:
        assert len(nat) == len(py) == len(kv)
        for k, v in kv.items():
            assert nat.get(k) == v
        for _ in range(100):
            probe = rng.randbytes(rng.randint(1, 64))
            assert nat.get(probe) == py.get(probe)
