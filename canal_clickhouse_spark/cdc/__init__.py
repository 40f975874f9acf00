"""§2 I — CDC / pipeline operators: the reference's core identity.

The reference (/root/reference/README.md:1) is a Canal→ClickHouse CDC
pipeline: MySQL binlog change events applied onto MergeTree tables whose merge
semantics (Replacing/Collapsing) encode mutability on an append-only store.
Here those semantics are explicit DataFrame operators over a deterministic
change-log fixture derived from ``orders`` (FIXTURES.md §3).
"""

from . import apply, changes, envelope, stream  # noqa: F401
