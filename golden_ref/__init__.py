"""Golden parity harness: builds the *reference* k-SLAM binary from
/root/reference (via minimal boost stub headers, since boost is not
installed here) and byte-diffs its SAM/XML/PerRead/abbreviated outputs
against this repo's pipeline on shared fixtures.

Nothing from the reference tree is copied into this repo; the binary is
compiled from the read-only reference sources into a scratch directory,
exactly like tests/oracle/ssw_oracle.py does for the SSW kernel.
"""
