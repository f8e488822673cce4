"""Host-side canonical-key arithmetic.

Keys are reversible 2-bit packings (first base in the low bits), so the
reference's string round-trips (reverseHash + re-hash, reference:
src/kreeq.cpp:432-433, src/subgraph.cpp:581-597 buildNextKmer) become
integer shifts here.
"""

from __future__ import annotations

from typing import Tuple

from ..constants import ITOC


def mask(k: int) -> int:
    return (1 << (2 * k)) - 1


def revcomp_key(key: int, k: int) -> int:
    out = 0
    for i in range(k):
        out = (out << 2) | (3 - ((key >> (2 * i)) & 3))
    return out


def canonical(key: int, k: int) -> Tuple[int, bool]:
    """(canonical key, isFw); isFw = forward packing <= revcomp packing."""
    rc = revcomp_key(key, k)
    return (key, True) if key <= rc else (rc, False)


def key_to_seq(key: int, k: int) -> str:
    """reverseHash equivalent: forward string of a key."""
    return "".join(ITOC[(key >> (2 * i)) & 3] for i in range(k))


def seq_to_key(seq: str) -> int:
    from ..constants import CTOI

    key = 0
    for i, c in enumerate(seq):
        key |= int(CTOI[ord(c)]) << (2 * i)
    return key


def next_key_fw(key: int, base: int, k: int) -> int:
    """Shift one base forward: kmer[1:] + base (reference buildNextKmer
    fw branch)."""
    return (key >> 2) | (base << (2 * (k - 1)))


def next_key_bw(key: int, base: int, k: int) -> int:
    """Shift one base backward: base + kmer[:-1] (reference
    buildNextKmer bw branch)."""
    return ((key << 2) & mask(k)) | base
