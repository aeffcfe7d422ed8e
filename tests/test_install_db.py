"""Offline test of the DB provisioning orchestration (scripts/install_db.py).

Network fetching is not exercised (zero-egress test env); build_database
and the marker/resume helpers are."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import install_db  # noqa: E402

from tests.test_io import GBFF  # reuse the GBFF fixture text

NAMES_DMP = (
    "1\t|\troot\t|\t\t|\tscientific name\t|\n"
    "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
    "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n")
NODES_DMP = (
    "1\t|\t1\t|\tno rank\t|\n"
    "2\t|\t1\t|\tsuperkingdom\t|\n"
    "562\t|\t2\t|\tspecies\t|\n")


def test_build_database_offline(tmp_path):
    tax = tmp_path / "taxonomy"
    tax.mkdir()
    (tax / "names.dmp").write_text(NAMES_DMP)
    (tax / "nodes.dmp").write_text(NODES_DMP)
    genomes = tmp_path / "bacteria"
    genomes.mkdir()
    (genomes / "a.gbff").write_text(GBFF)
    db = tmp_path / "DB"
    install_db.build_database(str(db), str(tax), [str(genomes)])
    assert (db / "taxDB").exists()
    assert (db / "kmer_index.npz").exists()
    from kslam_tpu.db.taxonomy import TaxonomyDB
    tdb = TaxonomyDB.read_index(str(db / "taxDB"))
    assert tdb.get_name(562) == "Escherichia coli"


def test_markers(tmp_path):
    m = tmp_path / "marker"
    assert not install_db.marker(str(m))
    install_db.touch(str(m))
    assert install_db.marker(str(m))
