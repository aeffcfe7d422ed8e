"""NCBI taxonomy: parsing, flat index, vectorized LCA tables.

Parsing and the 4-lines-per-record index format mirror the reference
(TaxonomyDatabase.h:95-183).  Queries are re-designed for the device:

  * taxids are mapped to dense node indices,
  * parent[], depth[] int32 arrays replace pointer chasing,
  * the reference's root-cut rule (parent==1 -> no parent,
    TaxonomyDatabase.h:225-231) is baked into parent[],
  * LCA of a hit set = iterative walk on (parent, depth) arrays; the
    vectorized batch version lives in ops/lca.py.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


class TaxonomyDB:
    def __init__(self):
        self.parent_of: Dict[int, int] = {}
        self.name_of: Dict[int, str] = {}
        self.rank_of: Dict[int, str] = {}
        # dense tables (built lazily by build_tables)
        self._tables = None

    # --- parsing (TaxonomyDatabase.h:95-151) ---

    def parse_nodes_dump(self, path: str) -> None:
        with open(path) as fh:
            for line in fh:
                # nodes.dmp rows: taxid\t|\tparent\t|\trank\t|... ; the
                # reference tokenises on "\t|" (TaxonomyDatabase.h:102)
                parts = line.split("\t|")
                if len(parts) > 2:
                    taxid = int(parts[0].strip("\t"))
                    parent = int(parts[1].strip("\t"))
                    rank = parts[2].strip("\t")
                    self.parent_of[taxid] = parent
                    self.rank_of[taxid] = rank

    def parse_names_dump(self, path: str) -> None:
        with open(path) as fh:
            for line in fh:
                tokens = [t.strip("\t") for t in line.split("|")]
                if len(tokens) > 3 and tokens[3] == "scientific name":
                    self.name_of[int(tokens[0])] = tokens[1]

    # --- flat index format (TaxonomyDatabase.h:153-183) ---

    def write_index(self, path: str) -> None:
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "w") as out:
            for taxid in self.parent_of:
                out.write(f"{taxid}\n{self.parent_of[taxid]}\n"
                          f"{self.name_of.get(taxid, '')}\n"
                          f"{self.rank_of.get(taxid, '')}\n")

    @classmethod
    def read_index(cls, path: str) -> "TaxonomyDB":
        db = cls()
        with open(path) as fh:
            while True:
                line = fh.readline()
                if not line:
                    break
                taxid = int(line)
                db.parent_of[taxid] = int(fh.readline())
                db.name_of[taxid] = fh.readline().rstrip("\n")
                db.rank_of[taxid] = fh.readline().rstrip("\n")
        return db

    @classmethod
    def from_dumps(cls, names_dmp: str, nodes_dmp: str) -> "TaxonomyDB":
        db = cls()
        db.parse_nodes_dump(nodes_dmp)
        db.parse_names_dump(names_dmp)
        return db

    # --- queries (reference-parity scalar versions) ---

    def get_parent(self, taxid: int) -> int:
        """TaxonomyDatabase.h:225-231: parent==1 (root) maps to 0."""
        parent = self.parent_of.get(taxid)
        if parent is None or parent == 1:
            return 0
        return parent

    def get_name(self, taxid: int) -> str:
        return self.name_of.get(taxid, "")

    def get_rank(self, taxid: int) -> str:
        return self.rank_of.get(taxid, "")

    def lowest_common_ancestor(self, taxids: List[int]) -> int:
        """TaxonomyDatabase.h:185-223: build root-paths (taxid itself
        included; unknown taxids give single-node paths; taxid 0 gives an
        empty path), walk the common prefix."""
        if not taxids:
            return 0
        paths = []
        for taxid in taxids:
            path = []
            t = taxid
            while t != 0:
                path.append(t)
                t = self.get_parent(t)
            path.reverse()
            paths.append(path)
        paths.sort(key=len)
        consensus = 0
        for i in range(len(paths[0])):
            value = 0
            for path in paths:
                if value == 0:
                    value = path[i]
                elif value != path[i]:
                    return consensus
            consensus = value
        return consensus

    def get_taxid_at_rank(self, taxid: int, rank: str) -> int:
        """TaxonomyDatabase.h:306-317."""
        t = taxid
        while t in self.parent_of and self.parent_of[t] != 1:
            if self.rank_of.get(t) == rank:
                return t
            t = self.parent_of[t]
        # reference returns 0 once parent==1 or missing without checking the
        # final node's rank in the ==1 case?  It checks rank before moving:
        # loop condition excludes nodes whose parent is 1.
        return 0

    def is_sub_species(self, taxid: int) -> bool:
        """TaxonomyDatabase.h:332-348."""
        t = taxid
        levels = 0
        while t in self.parent_of and self.parent_of[t] != 1:
            if self.rank_of.get(t) == "species":
                return levels > 0
            t = self.parent_of[t]
            levels += 1
        return False

    def get_lineage(self, taxid: int) -> str:
        """TaxonomyDatabase.h:249-265: '; '-joined root->leaf, skipping
        131567 'cellular organisms', resetting below species, trailing '.'"""
        lineage = ""
        t = taxid
        while True:
            if t != 131567:
                if lineage:
                    lineage = "; " + lineage
                lineage = self.get_name(t) + lineage
                if self.get_rank(t) == "species":
                    lineage = ""
            t = self.get_parent(t)
            if t == 0:
                if lineage:
                    lineage += "."
                break
        return lineage

    def get_metaphlan_lineage(self, taxid: int) -> str:
        """TaxonomyDatabase.h:266-304."""
        if self.get_rank(taxid) == "superphylum":
            return ""
        prefix_of = {"species": "|s__", "genus": "|g__", "family": "|f__",
                     "order": "|o__", "class": "|c__", "phylum": "|p__"}
        lineage = ""
        t = taxid
        while True:
            if t != 131567:
                rank = self.get_rank(t)
                if rank in prefix_of:
                    lineage = prefix_of[rank] + self.get_name(t) + lineage
                elif rank == "superkingdom":
                    lineage = "k__" + self.get_name(t) + lineage
            t = self.get_parent(t)
            if t == 0:
                break
        return lineage.replace(" ", "_")

    # --- dense tables for the device (ops/lca.py) ---

    def build_tables(self):
        """Returns (taxids_sorted, parent_idx, depth) where parent_idx maps
        dense node index -> dense parent index (-1 at the cut roots) and
        depth is the root-path length minus one."""
        if self._tables is not None:
            return self._tables
        taxids = np.array(sorted(self.parent_of.keys()), dtype=np.int64)
        pos = {int(t): i for i, t in enumerate(taxids)}
        parent_idx = np.full(len(taxids), -1, dtype=np.int32)
        for i, t in enumerate(taxids):
            parent = self.get_parent(int(t))
            if parent != 0 and parent in pos:
                parent_idx[i] = pos[parent]
        # depth via iterative propagation (graph is a forest after the cut)
        depth = np.full(len(taxids), -1, dtype=np.int32)
        depth[parent_idx < 0] = 0
        while True:
            unknown = np.nonzero(depth < 0)[0]
            if len(unknown) == 0:
                break
            parent_depth = depth[parent_idx[unknown]]
            ready = unknown[parent_depth >= 0]
            if len(ready) == 0:
                depth[unknown] = 0  # cycle in a corrupt dump: sever
                break
            depth[ready] = depth[parent_idx[ready]] + 1
        self._tables = (taxids, parent_idx, depth)
        return self._tables
