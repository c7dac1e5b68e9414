"""H2D tunnel weather probe: stages 96 MB as 1 MB chunks, prints GB/s.

The axon dev tunnel's sustained H2D throughput swings by >10x between
process lifetimes (relay flow-control weather). bench.py structures
around it; this probe measures the current weather in isolation so a
bad bench number can be attributed (run it before/after bench).
"""
import sys
import time

import numpy as np


def main(total_mb: int = 96, chunk_mb: float = 1.0) -> float:
    import jax
    jax.block_until_ready(jax.device_put(np.zeros(1 << 20, np.int8)))
    sz = int(chunk_mb * (1 << 20))
    n = (total_mb << 20) // sz
    arrs = [np.zeros(sz, np.int8) for _ in range(n)]
    for a in arrs:
        a.fill(1)
    t = time.perf_counter()
    d = [jax.device_put(a) for a in arrs]
    jax.block_until_ready(d)
    dt = time.perf_counter() - t
    gbps = total_mb / 1024 / dt * 1.048576
    print(f"h2d {total_mb} MB as {chunk_mb} MB chunks: {dt:.3f}s  {gbps:.3f} GB/s")
    return gbps


if __name__ == "__main__":
    sys.path.insert(0, "src")
    main()
