#!/usr/bin/env python3
"""Audit Verify outputs for DECIMAL-typed columns (forbidden in query
outputs: the driver hash canonicalizes parquet DECIMAL != DuckDB
decimal, so value-identical results still mismatch).

Usage: python3 tools/audit_decimal.py target/v [target/v2 ...]
Exits nonzero and prints offenders if any output parquet carries a
decimal at any nesting level."""
import sys, glob, os
import pyarrow.parquet as pq
import pyarrow.types as pt


def has_decimal(t):
    if pt.is_decimal(t):
        return True
    if pt.is_list(t) or pt.is_large_list(t):
        return has_decimal(t.value_type)
    if pt.is_struct(t):
        return any(has_decimal(f.type) for f in t)
    if pt.is_map(t):
        return has_decimal(t.key_type) or has_decimal(t.item_type)
    return False


def main():
    bad = []
    for root in sys.argv[1:] or ["target/v"]:
        for d in sorted(glob.glob(os.path.join(root, "*.parquet"))):
            files = glob.glob(os.path.join(d, "*.parquet")) or [d]
            schema = pq.read_schema(files[0])
            for f in schema:
                if has_decimal(f.type):
                    bad.append(f"{d}: {f.name}: {f.type}")
    if bad:
        print("DECIMAL output columns found:")
        print("\n".join(bad))
        sys.exit(1)
    print("OK: no decimal output columns")


if __name__ == "__main__":
    main()
