"""Fixed-capacity open-addressing spatial hash, as pure array ops.

TPU-native replacement for the reference's
`std::unordered_map<VOXEL_LOCATION, ...>` (voxel_map.h:107-118, vio.h:126):
keys are int32 voxel coordinates packed as one (C, 3) array, slots live in
dense arrays indexed 0..capacity-1, and both lookup and insertion are
fixed-shape batched ops — one (N, 3) gather per probe step — so they run
inside one jitted per-frame update. (Packing the three coordinates into a
single array matters on TPU: the per-probe op count is what dominates the
map update, not bandwidth.)

Collision policy: linear probing with a fixed probe length. There are no
per-slot deletions (map sliding compacts the whole table instead), so an
empty slot terminates a probe chain soundly.

Insertion is race-free under SPMD batching: each probe round claims empty
slots with a scatter-max ticket, winners write their key, and everyone
re-reads the slot so intra-batch duplicates of the same key resolve to the
winner's slot in the same round.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

EMPTY = jnp.int32(0x7FFFFFFF)

# Large primes for the 3D spatial hash (standard Teschner-style mixing).
_P1, _P2, _P3 = 73856093, 19349669, 83492791


class HashTable(NamedTuple):
    """Key storage only; value arrays are owned by the caller and indexed
    by the slot ids this module returns. keys[:, 0] == EMPTY marks a free
    slot."""

    keys: jnp.ndarray  # (C, 3) int32


def make_table(capacity: int) -> HashTable:
    return HashTable(keys=jnp.full((capacity, 3), EMPTY, jnp.int32))


def _bucket(keys, capacity):
    h = (keys[..., 0] * _P1) ^ (keys[..., 1] * _P2) ^ (keys[..., 2] * _P3)
    # murmur-style finalizer: the raw prime mix clusters badly for the
    # small coordinate ranges of room-scale maps, which lengthens probe
    # chains and drops inserts at the probe-window limit.
    h = h ^ (h >> 13)
    h = h * jnp.int32(-2048144789)  # 0x85ebca6b as signed int32
    h = h ^ (h >> 16)
    return jnp.bitwise_and(h, capacity - 1)


def voxel_key(points: jnp.ndarray, voxel_size) -> jnp.ndarray:
    """World position (N, 3) -> int32 voxel key (N, 3) by flooring
    (reference key rule, voxel_map.cpp:561-567)."""
    return jnp.floor(points / voxel_size).astype(jnp.int32)


@partial(jax.jit, static_argnames=("probes",))
def lookup(table: HashTable, keys: jnp.ndarray, probes: int = 8) -> jnp.ndarray:
    """Find slots for a batch of keys (N, 3). Returns (N,) int32 slot ids,
    -1 where the key is absent."""
    capacity = table.keys.shape[0]
    h = _bucket(keys, capacity)
    slot_out = jnp.full(h.shape, -1, jnp.int32)
    open_chain = jnp.ones(h.shape, dtype=bool)
    for j in range(probes):
        s = jnp.bitwise_and(h + j, capacity - 1)
        tk = table.keys[s]  # (N, 3)
        found = jnp.all(tk == keys, axis=-1)
        hit = open_chain & found
        slot_out = jnp.where(hit, s, slot_out)
        # An empty slot ends the chain: the key cannot be further along.
        open_chain = open_chain & ~found & (tk[:, 0] != EMPTY)
    return slot_out


@partial(jax.jit, static_argnames=("probes",))
def lookup_or_insert(table: HashTable, keys: jnp.ndarray, valid: jnp.ndarray,
                     probes: int = 8):
    """Find-or-claim slots for a batch of keys.

    valid: (N,) bool — padding lanes never insert. Returns
    (new_table, slots) with slots (N,) int32, -1 only when the probe
    window was exhausted (overflow; callers drop those lanes).
    """
    capacity = table.keys.shape[0]
    n = keys.shape[0]
    h = _bucket(keys, capacity)
    lane = jnp.arange(n, dtype=jnp.int32)
    slot_out = jnp.full((n,), -1, jnp.int32)
    unresolved = valid
    tkeys = table.keys
    for j in range(probes):
        s = jnp.bitwise_and(h + j, capacity - 1)
        tk = tkeys[s]
        found = jnp.all(tk == keys, axis=-1)
        hit = unresolved & found
        slot_out = jnp.where(hit, s, slot_out)
        unresolved = unresolved & ~found
        # Claim empty slots: one winner per slot via scatter-max ticket.
        cand = unresolved & (tk[:, 0] == EMPTY)
        ticket = jnp.where(cand, lane, -1)
        s_or_oob = jnp.where(cand, s, capacity)  # drop non-candidates
        claims = jnp.full((capacity,), -1, jnp.int32).at[s_or_oob].max(
            ticket, mode="drop"
        )
        won = cand & (claims[s] == lane)
        ws = jnp.where(won, s, capacity)
        tkeys = tkeys.at[ws].set(keys, mode="drop")
        # Re-read: winners and same-key losers both resolve here.
        refound = cand & jnp.all(tkeys[s] == keys, axis=-1)
        slot_out = jnp.where(refound, s, slot_out)
        unresolved = unresolved & ~refound
    return HashTable(keys=tkeys), slot_out
