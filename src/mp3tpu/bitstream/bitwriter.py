"""MSB-first bit writer (encoder side, SURVEY.md E6)."""
from __future__ import annotations


class BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_bits(self, other: "BitWriter"):
        self.bits.extend(other.bits)

    def __len__(self):
        return len(self.bits)

    def to_bytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            assert len(out) <= pad_to, f"overflow: {len(out)} > {pad_to}"
            out += b"\x00" * (pad_to - len(out))
        return bytes(out)
