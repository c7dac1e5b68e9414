"""Recover the ISO 11172-3 Annex B.7 Layer-III Huffman code tables by
black-box probing of libmpg123 (the de-facto reference decoder).

Method: for each Huffman table T we craft valid single-granule mono frames
whose granule-0 Huffman payload is a chosen bit path plus a fixed filler, and
read back the decoded (x, y) big-values pair from the decoded float PCM by
least-squares projection onto per-spectral-line impulse responses (which are
themselves measured from count1-region probe streams). A tree node `p` is a
leaf iff the all-zeros and all-ones continuations decode to the same
(escape-clamped) pair — distinct leaves always hold distinct (x,y) values,
so internal nodes always disagree. This recovers code, length, x, y for
every leaf of every table, purely behaviorally.

The recovered data is written to tools/extracted/huffman_tables.json and then
committed as mp3tpu spec-table source. The framework never links mpg123.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import mpg123ref  # noqa: E402
from craft import GranuleSpec, craft_stream  # noqa: E402

N_LINES = 44          # spectral lines we can read back (11 count1 quads)
FILLER = 48           # continuation bits appended to every probe path
TOTAL_SIG = 6 * 1152  # samples per decoded probe stream


def decode_probe(gr: GranuleSpec) -> np.ndarray:
    pcm, _ = mpg123ref.decode(craft_stream(gr))
    sig = np.zeros(TOTAL_SIG, np.float64)
    n = min(len(pcm), TOTAL_SIG)
    sig[:n] = pcm[:n, 0]
    return sig


def measure_responses() -> np.ndarray:
    """R[i] = decoded-signal response of +1 at spectral line i of granule 0.

    Uses count1-only streams (big_values=0) with count1 table B, whose codes
    were independently extracted from libmpg123's .rodata tree data:
    code('1111')->quad 0 (no spectrum, no sign bits);
    code('0000')->quad 15 = (1,1,1,1) followed by 4 sign bits.
    """
    R = np.zeros((N_LINES, TOTAL_SIG))
    nq = N_LINES // 4
    for m in range(nq):
        base = "1111" * m + "0000"
        sigs = {}
        for flip in (-1, 0, 1, 2, 3):
            signs = ["0"] * 4
            if flip >= 0:
                signs[flip] = "1"
            bits = base + "".join(signs)
            sigs[flip] = decode_probe(
                GranuleSpec(part2_3_length=len(bits), big_values=0,
                            count1table_select=1, main_bits=bits))
        for j in range(4):
            R[4 * m + j] = (sigs[-1] - sigs[j]) / 2.0
    return R


class Prober:
    def __init__(self):
        print("measuring spectral-line responses...", flush=True)
        self.R = measure_responses()
        # pseudo-inverse for least squares readback
        A = self.R.T  # [T, N_LINES]
        self.pinv = np.linalg.pinv(A)
        self.cache: dict[tuple[int, str], tuple[int, int]] = {}
        self.n_queries = 0

    def first_pair(self, table: int, payload: str) -> tuple[int, int]:
        key = (table, payload)
        if key in self.cache:
            return self.cache[key]
        self.n_queries += 1
        gr = GranuleSpec(part2_3_length=len(payload), big_values=1,
                         table_select=(table, 0, 0), count1table_select=1,
                         main_bits=payload)
        sig = decode_probe(gr)
        c = self.pinv @ sig
        def val(ci):
            v = abs(ci) ** 0.75
            return min(int(round(v)), 15)
        pair = (val(c[0]), val(c[1]))
        # sanity: fit residual must be tiny relative to signal
        resid = sig - self.R.T @ c
        if np.linalg.norm(sig) > 1e-6:
            rel = np.linalg.norm(resid) / np.linalg.norm(sig)
            if rel > 1e-3:
                raise RuntimeError(f"bad fit rel={rel} table={table} payload={payload}")
        self.cache[key] = pair
        return pair

    def query(self, table: int, path: str, cont: str) -> tuple[int, int]:
        payload = path + cont * ((FILLER + len(cont) - 1) // len(cont))
        payload = payload[: len(path) + FILLER]
        return self.first_pair(table, payload)

    def extract_table(self, table: int) -> dict:
        leaves = []
        stack = [""]
        while stack:
            p = stack.pop()
            if len(p) > 19:
                raise RuntimeError(f"depth >19 at table {table} path {p}")
            fz = self.query(table, p, "0")
            fo = self.query(table, p, "1")
            if fz == fo and p != "":
                leaves.append({"code": p, "x": fz[0], "y": fz[1]})
            else:
                stack.append(p + "0")
                stack.append(p + "1")
        kraft = sum(2.0 ** -len(l["code"]) for l in leaves)
        xs = max(l["x"] for l in leaves) + 1
        ys = max(l["y"] for l in leaves) + 1
        pairs = {(l["x"], l["y"]) for l in leaves}
        assert abs(kraft - 1) < 1e-12, f"table {table} kraft {kraft}"
        assert len(pairs) == len(leaves) == xs * ys, \
            f"table {table}: {len(leaves)} leaves, dims {xs}x{ys}"
        print(f"table {table}: {xs}x{ys}, {len(leaves)} leaves, "
              f"{self.n_queries} total queries", flush=True)
        return {"table": table, "xlen": xs, "ylen": ys, "leaves": leaves}

    def probe_linbits(self, table: int, tree: dict) -> int:
        """Decode an escape (x=15) leaf with all-ones linbits; infer linbits."""
        leaf = next(l for l in tree["leaves"] if l["x"] == 15 and l["y"] == 0)
        for lb in range(0, 14):
            bits = leaf["code"] + "1" * lb + "0"  # code + linbits + sign_x
            gr = GranuleSpec(part2_3_length=len(bits), big_values=1,
                             table_select=(table, 0, 0), count1table_select=1,
                             main_bits=bits)
            sig = decode_probe(gr)
            c = self.pinv @ sig
            v = abs(c[0]) ** 0.75
            if abs(v - (15 + (1 << lb) - 1)) < 0.45 * max(1, v ** 0.25):
                # candidate; verify exact integer match
                if round(v) == 15 + (1 << lb) - 1:
                    return lb
        raise RuntimeError(f"linbits not identified for table {table}")


def main():
    pr = Prober()
    # sanity: verify table 1 against its universally known values
    t1 = pr.extract_table(1)
    got = {l["code"]: (l["x"], l["y"]) for l in t1["leaves"]}
    assert got == {"1": (0, 0), "01": (1, 0), "001": (0, 1), "000": (1, 1)}, got
    print("table 1 sanity check PASSED")

    out = {"tables": [t1], "linbits": {}}
    for t in (2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24):
        if t == 1:
            continue
        out["tables"].append(pr.extract_table(t))

    tree16 = next(t for t in out["tables"] if t["table"] == 16)
    tree24 = next(t for t in out["tables"] if t["table"] == 24)
    for t in range(16, 32):
        base = tree16 if t < 24 else tree24
        lb = pr.probe_linbits(t, base)
        out["linbits"][str(t)] = lb
        print(f"table {t}: linbits={lb}", flush=True)

    os.makedirs(os.path.join(os.path.dirname(__file__), "extracted"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "extracted", "huffman_tables.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path, "queries:", pr.n_queries)


if __name__ == "__main__":
    main()
