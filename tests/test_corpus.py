"""Corpus size gate vs the compiled reference (VERDICT r4 #1, BASELINE.md).

Seven structurally distinct mesh classes (tests/corpus.py); for each, our
reference-compatible v0 archive must be no larger than the compiled
reference library's own archive, and the chunked v1 product path must be no
larger than v0 — so switching to the parallel format never costs bytes.
Round-trips are asserted bit-exact on raw integer views.
`scripts/corpus_gate.py` is the reporting version of this gate (CORPUS.json).
"""

import numpy as np
import pytest

import corpus as corpus_mod
import ref_oracle
from scripts.corpus_gate import our_archive, roundtrip_check


@pytest.fixture(scope="module")
def meshes():
    return corpus_mod.build_corpus()


NAMES = ["grid", "scan", "cad", "attrib", "double", "longidx", "bunny"]


@pytest.mark.parametrize("name", NAMES)
def test_size_gate_and_roundtrip(meshes, name):
    if name not in meshes:
        pytest.skip("bunny fixture unavailable")
    mesh = meshes[name]
    ref = ref_oracle.ref_archive(mesh)
    v0 = our_archive(mesh)
    v1 = our_archive(mesh, chunk_len=4096)
    roundtrip_check(v0, mesh)
    roundtrip_check(v1, mesh)
    if ref is None:
        pytest.skip("compiled reference unavailable")
    assert len(v0) <= len(ref), f"v0 {len(v0)} > reference {len(ref)}"
    assert len(v1) <= len(v0), f"v1 {len(v1)} > v0 {len(v0)}"
