"""Catalog — a directory of LakeTables with table-level DDL.

The reference replicates table-level DDL events alongside row changes:
CreateTable / DropTable / TruncateTable / RenameTable / CreateDatabase /
DropDatabase (reference dt-common/src/meta/ddl_meta/ddl_type.rs:7-36; replay
coverage dt-tests/tests/mysql_to_mysql/cdc/ddl_test/src_test.sql).  The
Spark-side analog of a database is a directory of LakeTable roots; this
module provides the table-level operations with the same replay-idempotence
contract the engine's column DDL already has (re-applying after a crash is
a no-op, never an error).

Atomicity notes (single-writer per catalog, like the engine's DDL barrier):
* create_table: LakeTable.create publishes v0 via `os.link` (EEXIST =>
  CommitConflict), so of two concurrent creators exactly one wins; a crash
  mid-create leaves a resumable half-made dir, not a bricked one.
* rename_table: `os.rename` of the table root is atomic on a POSIX fs; the
  manifest stores only relative paths, so a renamed table is immediately
  loadable.  (On object stores this becomes a catalog pointer swap.)
* drop_table: the root is moved into `.trash-<uuid>` first (atomic hide),
  then deleted — readers never observe a half-deleted table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from ape_dts_spark.lake.table import LakeTable


class Catalog:
    """A filesystem-backed database of LakeTables (one subdir per table)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"illegal table name {name!r}")
        return os.path.join(self.root, name)

    def list_tables(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if not d.startswith(".") and LakeTable.exists(os.path.join(self.root, d))
        )

    def has_table(self, name: str) -> bool:
        return LakeTable.exists(self._path(name))

    def table(self, name: str) -> LakeTable:
        return LakeTable.load(self._path(name))

    def create_table(
        self,
        name: str,
        cols: list[tuple],
        bucket_key: str | None = None,
        bucket_count: int = 16,
        if_not_exists: bool = False,
    ) -> LakeTable:
        """CREATE TABLE (ddl_type.rs CreateTable).  With if_not_exists=True a
        replay over an existing table returns it unchanged (idempotent)."""
        p = self._path(name)
        if LakeTable.exists(p):
            if if_not_exists:
                return LakeTable.load(p)
            raise ValueError(f"table {name} already exists")
        return LakeTable.create(p, cols, bucket_key=bucket_key, bucket_count=bucket_count)

    def drop_table(self, name: str, if_exists: bool = False) -> bool:
        """DROP TABLE (ddl_type.rs DropTable): atomic hide then delete."""
        p = self._path(name)
        if not LakeTable.exists(p):
            if if_exists:
                return False
            raise ValueError(f"no table {name}")
        trash = os.path.join(self.root, f".trash-{uuid.uuid4().hex}")
        os.rename(p, trash)
        shutil.rmtree(trash, ignore_errors=True)
        return True

    def rename_table(self, old: str, new: str, if_exists: bool = False) -> bool:
        """RENAME TABLE (ddl_type.rs RenameTable): atomic directory rename.

        Replay-idempotent with if_exists=True: if `old` is gone and `new`
        already exists, the rename is treated as already applied."""
        po, pn = self._path(old), self._path(new)
        if not LakeTable.exists(po):
            if if_exists and LakeTable.exists(pn):
                return False  # already applied (crash replay)
            raise ValueError(f"no table {old}")
        if LakeTable.exists(pn):
            raise ValueError(f"table {new} already exists")
        os.rename(po, pn)
        return True

    def truncate_table(self, name: str) -> int:
        """TRUNCATE TABLE (ddl_type.rs TruncateTable) — delegates to the
        table-level metadata-only truncate."""
        return self.table(name).truncate()

    # ------------------------------------------------------ database level

    @staticmethod
    def create_database(base_root: str, name: str, if_not_exists: bool = True) -> "Catalog":
        """CREATE DATABASE (ddl_type.rs CreateDatabase/CreateSchema): a
        database is a directory of catalog roots.  Idempotent by default —
        the engine's crash-replay contract (re-applying a DDL after a crash
        must be a no-op)."""
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"illegal database name {name!r}")
        path = os.path.join(base_root, name)
        if os.path.isdir(path):
            if not if_not_exists:
                raise FileExistsError(f"database {name!r} exists")
            return Catalog(path)
        os.makedirs(path, exist_ok=if_not_exists)
        return Catalog(path)

    @staticmethod
    def drop_database(
        base_root: str, name: str, if_exists: bool = False, cascade: bool = False
    ) -> bool:
        """DROP DATABASE (ddl_type.rs DropDatabase/DropSchema).  Non-cascade
        refuses when tables remain (the SQL contract); cascade trash-hides
        the whole directory first (atomic rename), then deletes — readers
        never observe a half-dropped database."""
        # the empty string must be illegal too: '' resolves to base_root
        # itself and a cascade drop would delete the entire warehouse
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"illegal database name {name!r}")
        path = os.path.join(base_root, name)
        if not os.path.isdir(path):
            if if_exists:
                return False
            raise FileNotFoundError(f"database {name!r} does not exist")
        tables = Catalog(path).list_tables()
        if tables and not cascade:
            raise ValueError(f"database {name!r} is not empty: {tables}; use cascade=True")
        trash = os.path.join(base_root, f".trash-db-{uuid.uuid4().hex}")
        os.rename(path, trash)
        shutil.rmtree(trash, ignore_errors=True)
        return True

    @staticmethod
    def list_databases(base_root: str) -> list[str]:
        return sorted(
            d
            for d in os.listdir(base_root)
            if not d.startswith(".") and os.path.isdir(os.path.join(base_root, d))
        ) if os.path.isdir(base_root) else []
