"""Extract ISO 11172-3 Layer III spec *data* tables from system codec libraries.

The MP3 Huffman code tables (ISO 11172-3 Annex B.7) and scalefactor band
boundaries (Annex B.8) are pure spec data. libmpg123 (system library) embeds
them in .rodata in a documented tree format: arrays of int16 where a negative
value v is a branch node (bit==0 -> next short, bit==1 -> jump |v| shorts
ahead from the following position) and a non-negative value is a leaf
(x<<4 | y). We walk the trees to recover canonical (code, length, x, y)
tables, validate completeness/prefix-freeness, and emit a Python module.

This is a build-time tool; its output is committed as mp3tpu table data.
"""
import struct, sys, json

LIB = "/usr/lib/x86_64-linux-gnu/libmpg123.so.0"
data = open(LIB, "rb").read()

def i16(off):
    return struct.unpack_from("<h", data, off)[0]

# --- locate tab1 signature ---
sig = struct.pack("<7h", -5, -3, -1, 17, 1, 16, 0)
idx = data.find(sig)
assert idx >= 0, "tab1 signature not found"
print("tab1 at file offset", idx)

# tab0 = {0} should immediately precede (one short) -- check
print("preceding shorts:", [i16(idx - 2 * k) for k in range(1, 4)])

def walk_tree(base_off):
    """Walk an mpg123 huffman tree starting at byte offset base_off.
    Returns (leaves: list[(code_str, value)], extent_in_shorts)."""
    leaves = []
    visited = set()
    maxidx = 0
    def rec(ptr, code):
        nonlocal maxidx
        if ptr in visited:
            raise ValueError(f"revisit at {ptr}")
        if ptr > 4096:
            raise ValueError("runaway")
        visited.add(ptr)
        maxidx = max(maxidx, ptr)
        a = i16(base_off + 2 * ptr)
        if a < 0:
            rec(ptr + 1, code + "0")
            rec(ptr + 1 + (-a), code + "1")
        else:
            leaves.append((code, a))
    rec(0, "")
    extent = maxidx + 1
    if len(visited) != extent:
        raise ValueError(f"non-compact tree: {len(visited)} visited vs extent {extent}")
    return leaves, extent

# walk consecutive trees starting at tab0 (= idx - 2)
tables = []
off = idx - 2
for t in range(40):
    try:
        leaves, extent = walk_tree(off)
    except ValueError as e:
        print(f"stop at array {t}: {e}")
        break
    xs = [v >> 4 for _, v in leaves]
    ys = [v & 15 for _, v in leaves]
    dims = (max(xs) + 1, max(ys) + 1)
    kraft = sum(2.0 ** -len(c) for c, _ in leaves)
    tables.append(dict(off=off, n_leaves=len(leaves), extent=extent, dims=dims, kraft=kraft,
                       leaves=leaves))
    print(f"array {t}: off={off} leaves={len(leaves)} dims={dims} kraft={kraft}")
    off += 2 * extent

json.dump(tables, open("/tmp/mpg123_hufftrees.json", "w"))
print("wrote /tmp/mpg123_hufftrees.json with", len(tables), "arrays")

# --- bandInfo: search for 44100 longIdx as u16 sequence ---
longidx_441 = [0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576]
sig2 = struct.pack("<23H", *longidx_441)
j = data.find(sig2)
print("bandInfo 44100 longIdx at", j)
