"""Device-side Huffman spike (SURVEY.md §7.5-1 stretch rung; see
docs/host_unpack_notes.md "Where it tops out").

Measures the IRREDUCIBLE part of moving the count1/big_values Huffman
decode onto the TPU: the bit-serial DFA transition chain, batched over
granule-channels. The DFA here is the real count1 table-A automaton
(trie nodes + sign-consumption chain states, ~47 states) driven by a
`lax.scan` over bit steps with a VMEM-resident transition table — the
cheapest TPU formulation that exists (gather from a tiny table; the
one-hot-matmul alternative multiplies the work by n_states).

What this deliberately does NOT include (all additional cost):
value extraction, linbits, the emitted-quad -> spectrum-line placement
(a data-dependent scatter: as a one-hot matmul it is
rows x steps x 576 x 2 FLOPs ~= 4e13 for count1 alone at bench scale),
or shipping main_data to the device. If the transition chain alone is
not decisively faster than the ENTIRE host count1 section (~0.07 s for
256 streams incl. emission+pack, host_unpack_notes.md), the rung is
dead and the host C++ path stands.

Run: python tools/device_huffman_spike.py [rows] [bits]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (os.path.join(_REPO, "src"),):
    if p not in sys.path:
        sys.path.insert(0, p)


def build_count1a_dfa():
    """Real count1 table-A DFA: binary trie + sign-chain states.
    Returns (trans [n_states, 2] int32, n_states). State 0 is the root;
    every transition INTO state 0 completes one quad (4 lines)."""
    from mp3tpu.tables.huffman import COUNT1A_CODES, COUNT1A_LENS
    children: list[list[int]] = [[-1, -1]]   # trie: state -> [on0, on1]
    leaf_quad: dict[int, int] = {}
    for q, (code, ln) in enumerate(zip(COUNT1A_CODES, COUNT1A_LENS)):
        s = 0
        for i in range(ln - 1, -1, -1):
            b = (code >> i) & 1
            if i == 0:
                # leaf: transition handled below via leaf_quad
                leaf_quad[(s, b)] = q
            else:
                if children[s][b] == -1:
                    children.append([-1, -1])
                    children[s][b] = len(children) - 1
                s = children[s][b]
    n_trie = len(children)
    # sign-chain states: quad q needs popcount(q) sign bits; sign bit
    # VALUES don't change control flow, so a chain of k states suffices
    # per (remaining count) — share chains by remaining-count only.
    max_signs = 4
    sign_state = {k: n_trie + k - 1 for k in range(1, max_signs + 1)}
    n_states = n_trie + max_signs
    trans = np.zeros((n_states, 2), np.int32)
    for s in range(n_trie):
        for b in (0, 1):
            if (s, b) in leaf_quad:
                q = leaf_quad[(s, b)]
                k = bin(q).count("1")
                trans[s, b] = sign_state[k] if k else 0
            elif children[s][b] != -1:
                trans[s, b] = children[s][b]
            else:
                trans[s, b] = 0          # unreachable in valid streams
    for k in range(1, max_signs + 1):
        s = sign_state[k]
        nxt = 0 if k == 1 else sign_state[k - 1]
        trans[s, 0] = trans[s, 1] = nxt
    return trans, n_states


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    trans, n_states = build_count1a_dfa()
    print(f"count1A DFA: {n_states} states")
    rng = np.random.default_rng(0)
    # packed bits as the device would receive them: uint8 bytes
    packed = rng.integers(0, 256, (rows, L // 8), np.uint8)

    Tflat = jnp.asarray(trans.reshape(-1))

    @jax.jit
    def fsm(packed_bytes):
        # unpack bytes -> bits [rows, L] (vectorized, cheap)
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = ((packed_bytes[:, :, None] >> shifts) & 1).astype(jnp.int32)
        bits = bits.reshape(packed_bytes.shape[0], -1)

        def step(state, b):
            nxt = jnp.take(Tflat, state * 2 + b)
            return nxt, (nxt == 0).astype(jnp.int8)

        s0 = jnp.zeros(packed_bytes.shape[0], jnp.int32)
        _, emits = jax.lax.scan(step, s0, bits.T)
        return emits.astype(jnp.int32).sum(axis=0)   # quads per row

    d = jnp.asarray(packed)
    t0 = time.time()
    out = jax.block_until_ready(fsm(d))
    print(f"compile+run {time.time()-t0:.1f}s; quads row0={int(out[0])}")
    walls = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(fsm(d))
        walls.append(time.time() - t0)
    w = min(walls)
    print(f"rows={rows} bits={L}: {w*1e3:.1f} ms steady "
          f"({rows*L/w/1e9:.2f} G transitions/s)")
    print("walls:", [round(x * 1e3, 1) for x in walls])
    # context: 256-stream bench batch = ~131072 granule-channels of
    # ~256 count1 bits; host count1 section (decode + values + signs +
    # plane pack) = ~0.07 s for the same batch (host_unpack_notes.md)
    streams = rows / 512.0
    print(f"host-equivalent: {w/max(streams,1e-9)*1e3:.3f} ms/stream "
          f"(transitions ONLY; host full count1 section ~0.28 ms/stream)")


if __name__ == "__main__":
    main()
