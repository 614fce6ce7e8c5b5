"""Amino-acid tables shared across the package.

Behavioural parity targets:
- three/single letter maps: reference merizo_search/programs/Foldclass/constants.py:1-10
- extended three-letter map used by the Merizo feature path:
  reference programs/Merizo/model/utils/features.py:21-29
- special/excluded residues: reference programs/Merizo/model/utils/build_info.py:145-178
"""

from __future__ import annotations

import numpy as np

# Canonical 20 amino acids in the one-hot order used by the Merizo encoder.
# The reference encodes via str.translate('ARNDCQEGHILKMFPSTWYV...' ->
# 'ABCDEFGHIJKLMNOPQRST...') - ord('A') (features.py:28-29,174-180), i.e. the
# integer class of a residue is its position in this string:
AA_ORDER = "ARNDCQEGHILKMFPSTWYV"

THREE_TO_ONE = {
    "ALA": "A", "CYS": "C", "ASP": "D", "GLU": "E", "PHE": "F",
    "GLY": "G", "HIS": "H", "ILE": "I", "LYS": "K", "LEU": "L",
    "MET": "M", "ASN": "N", "PRO": "P", "GLN": "Q", "ARG": "R",
    "SER": "S", "THR": "T", "VAL": "V", "TRP": "W", "TYR": "Y",
    "UNK": "X", "ASH": "D", "GLH": "E", "HID": "H", "HIE": "H",
    "HIP": "H", "HSD": "H", "HSE": "H", "LYN": "K",
}

ONE_TO_THREE = {v: k for k, v in THREE_TO_ONE.items()}

# Extended map used when generating Merizo features (includes PAD -> X).
THREE_TO_ONE_EXT = dict(THREE_TO_ONE)
THREE_TO_ONE_EXT.update({"PAD": "X", "SEC": "C", "MSE": "M", "PYL": "K"})

# Non-standard residues remapped to standard equivalents when parsing PDBs.
SPECIAL_AA_CONVERT = {
    "MSE": "MET",  # selenomethionine
    "SEC": "CYS",  # selenocysteine
    "CSD": "CYS",  # sulphinoalanine
    "PCA": "GLU",  # pyroglutamic acid
    "PYL": "LYS",  # pyrrolysine
}

EXCLUDE_AA = ("ASX", "GLX", "UNK")

# Integer encoding: residue class id in [0, 20); unknowns map to 19 ('V' slot is
# 19 but the reference maps B/J/O/U/X/Z and gap chars to classes 20/21 ('U','V'
# after translate) which one-hot(…, 20) would overflow — in practice unknowns are
# filtered before encoding. We clamp to 19 for robustness, mirroring the
# observable behaviour on the canonical alphabet.
_ENC = np.full(256, 19, dtype=np.int32)
for _i, _a in enumerate(AA_ORDER):
    _ENC[ord(_a)] = _i


def encode_seq(seq: str) -> np.ndarray:
    """Encode a one-letter sequence into int class ids [0,20).

    Parity: programs/Merizo/model/utils/features.py:174-180 for the canonical
    20-letter alphabet.
    """
    b = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
    return _ENC[b]


def seq_from_three(resn: np.ndarray) -> str:
    """Three-letter residue-name array -> one-letter string (X for unknowns)."""
    return "".join(THREE_TO_ONE_EXT.get(r, "X") for r in resn)
