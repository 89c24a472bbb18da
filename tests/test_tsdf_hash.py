import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.tsdf import hash as vhash


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    coords = rng.randint(-512, 512, size=(1000, 3)).astype(np.int32)
    keys = vhash.pack_key(jnp.asarray(coords))
    back = np.asarray(vhash.unpack_key(keys))
    np.testing.assert_array_equal(back, coords)
    assert (np.asarray(keys) >= 0).all()  # EMPTY_KEY (-1) can never collide


def test_insert_lookup_roundtrip():
    rng = np.random.RandomState(1)
    coords = rng.randint(-40, 40, size=(500, 3)).astype(np.int32)
    keys = vhash.pack_key(jnp.asarray(coords))
    table = vhash.HashTable.empty(2048)
    table, counter, vals, ovf = vhash.insert(
        table, jnp.zeros((), jnp.int32), keys, jnp.int32(1024)
    )
    vals = np.asarray(vals)
    assert not bool(ovf)
    # every key resolved
    assert (vals >= 0).all()
    # duplicates map to the same slot, uniques to distinct slots
    uniq = {}
    for k, v in zip(np.asarray(keys), vals):
        if k in uniq:
            assert uniq[k] == v
        else:
            uniq[k] = v
    assert len(set(uniq.values())) == len(uniq)
    assert int(counter) == len(uniq)
    # lookup agrees
    got = np.asarray(vhash.lookup(vhash.HashTable(table.keys, table.vals), keys))
    np.testing.assert_array_equal(got, vals)


def test_insert_is_idempotent():
    rng = np.random.RandomState(2)
    coords = rng.randint(-10, 10, size=(200, 3)).astype(np.int32)
    keys = vhash.pack_key(jnp.asarray(coords))
    table = vhash.HashTable.empty(1024)
    table, c1, v1, _ = vhash.insert(table, jnp.zeros((), jnp.int32), keys, jnp.int32(512))
    table2, c2, v2, _ = vhash.insert(table, c1, keys, jnp.int32(512))
    assert int(c1) == int(c2)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(table.keys), np.asarray(table2.keys))


def test_lookup_missing_returns_miss():
    table = vhash.HashTable.empty(256)
    keys = vhash.pack_key(jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32))
    got = np.asarray(vhash.lookup(table, keys))
    assert (got == -1).all()


def test_capacity_limit_overflow():
    rng = np.random.RandomState(3)
    coords = rng.randint(-30, 30, size=(400, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)[:300]
    keys = vhash.pack_key(jnp.asarray(coords))
    table = vhash.HashTable.empty(1024)
    table, counter, vals, ovf = vhash.insert(
        table, jnp.zeros((), jnp.int32), keys, jnp.int32(100)
    )
    assert bool(ovf)
    assert int(counter) == 100
    vals = np.asarray(vals)
    assert (vals < 100).all()
    resolved = vals[vals >= 0]
    assert len(np.unique(resolved)) == len(resolved) or len(resolved) >= 100 * 0.9


def test_exact_fill_is_not_overflow():
    """Filling the pool to exactly its capacity with every key allocated must
    NOT raise the overflow flag — only a key that actually failed to get a
    slot does."""
    coords = np.stack(np.meshgrid(np.arange(4), np.arange(4), np.arange(4)),
                      axis=-1).reshape(-1, 3).astype(np.int32)  # 64 unique
    keys = vhash.pack_key(jnp.asarray(coords))
    table = vhash.HashTable.empty(1024)
    table, counter, vals, ovf = vhash.insert(
        table, jnp.zeros((), jnp.int32), keys, jnp.int32(64))
    assert int(counter) == 64
    assert (np.asarray(vals) >= 0).all()
    assert not bool(ovf)
    # one more NEW key with a full pool -> now it overflows
    extra = vhash.pack_key(jnp.asarray([[9, 9, 9]], jnp.int32))
    table, counter, vals, ovf = vhash.insert(table, counter, extra, jnp.int32(64))
    assert bool(ovf)
    assert int(counter) == 64
    # re-inserting an EXISTING key with a full pool is a plain hit, no overflow
    table, counter, vals, ovf = vhash.insert(table, counter, keys[:8], jnp.int32(64))
    assert not bool(ovf)
    assert (np.asarray(vals) >= 0).all()


def test_empty_key_lanes_are_inert():
    table = vhash.HashTable.empty(256)
    keys = jnp.asarray([vhash.EMPTY_KEY] * 32, jnp.int32)
    table, counter, vals, ovf = vhash.insert(table, jnp.zeros((), jnp.int32), keys, jnp.int32(64))
    assert int(counter) == 0
    assert (np.asarray(vals) == -1).all()
