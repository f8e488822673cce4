"""Base-encoding tables shared across the framework.

The 2-bit base alphabet (A=0, C=1, G=2, T=3, complement = 3-x) is pinned
by the reference's edge-complement arithmetic (reference:
src/graph-builder.cpp:107-109) and validated bit-for-bit against the
testFiles/test1.kreeq database fixture.
"""

import numpy as np

# Sentinel code for any non-ACGT byte (N, read separators, ...).  Any
# code > 3 invalidates a k-mer window and breaks edge continuity,
# mirroring the reference's ctoi table semantics (reference:
# src/graph-builder.cpp:79-84).
BAD = 4

LARGEST_U32 = 0xFFFFFFFF  # saturation bound (reference: include/kreeq.h:68)

# char byte -> 2-bit code (case-insensitive); everything else -> BAD
CTOI = np.full(256, BAD, dtype=np.uint8)
for _i, _b in enumerate("ACGT"):
    CTOI[ord(_b)] = _i
    CTOI[ord(_b.lower())] = _i

ITOC = np.array(list("ACGT"), dtype="U1")

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A",
         "a": "t", "c": "g", "g": "c", "t": "a"}


def revcom(seq: str) -> str:
    """Reverse complement preserving case (reference: gfalibs revCom)."""
    return "".join(_COMP.get(c, c) for c in reversed(seq))


def seq_to_codes(seq: str) -> np.ndarray:
    """Convert a sequence string to a uint8 code array (BAD for non-ACGT)."""
    raw = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
    return CTOI[raw]


def codes_to_seq(codes: np.ndarray) -> str:
    return "".join(ITOC[c] if c <= 3 else "N" for c in codes)
