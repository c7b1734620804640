"""Cross-table transaction log — all-or-nothing visibility over
multiple lakes.

Generalizes the reference's single-DB-transaction truncate-and-load
(db2/db2.py:358-594: ``DELETE FROM prod; INSERT INTO prod ...`` in one
txn, rollback on failure) to the multi-table case a binlog router
needs: a WAL interleaves changes for several destination tables, and a
consumer must never observe table A advanced past table B for the same
LSN window.

Protocol (presumed-abort two-phase commit, storage objects as the log):

1. **Stage** — each lake's replay writes its partition manifests to
   ``<manifest>.txn-<id>`` (write-once objects, invisible to readers;
   ``TranscriptLake.commit_partition(txn=...)``).  Data files are
   written normally — content-named, so a retry is idempotent and an
   abort just leaves vacuumable orphans.
2. **Commit point** — ONE atomic object write of ``txn-<id>.json``
   into the transaction directory, recording the participant roots.
   Before this object exists the transaction is invisible everywhere;
   after, it is durable everywhere.  (Atomic on POSIX via the tmp +
   rename swap, on object stores by PUT whole-object atomicity —
   state/fs.py.)
3. **Publish** — flip each lake's staged manifests to current
   (``publish_txn``; idempotent per-manifest flips), then delete the
   record.

Recovery (:meth:`TxnLog.recover`) makes any crash point safe:
a record present → roll FORWARD (finish the publishes, delete the
record); staged manifests whose txn has no record → roll BACK (delete
the staged manifests; replays resume from the published watermarks, so
the events are re-applied exactly once).

The transaction directory may live on any backend the lakes do — the
scheme rides in ``txn_dir`` exactly as in lake roots.
"""

from __future__ import annotations

from .fs import storage_for


class TxnLog:
    def __init__(self, txn_dir: str):
        self.txn_dir = txn_dir
        self.store, self.phys = storage_for(txn_dir)
        self.store.ensure_dir(self.phys)

    def _path(self, txn_id: str) -> str:
        return self.store.join(self.phys, f"txn-{txn_id}.json")

    def pending(self) -> list[dict]:
        """Committed-but-unpublished transaction records."""
        out = []
        for name in self.store.list_objects(self.phys):
            if name.startswith("txn-") and name.endswith(".json"):
                rec = self.store.get_json(self.store.join(self.phys, name))
                if rec is not None:
                    out.append(rec)
        return sorted(out, key=lambda r: r["id"])

    def commit(self, txn_id: str, roots: list[str]) -> None:
        """THE commit point: one atomic record write.  Everything
        before this is invisible; everything after is durable."""
        self.store.put_json(self._path(txn_id), {"id": txn_id, "roots": list(roots)})

    def done(self, txn_id: str) -> None:
        self.store.delete(self._path(txn_id))

    def publish(self, txn_id: str, roots: list[str]) -> int:
        """Roll a committed transaction forward: flip every
        participant's staged manifests, then retire the record.
        Idempotent — safe to re-run after any partial publish."""
        from .lake import TranscriptLake

        n = 0
        for root in roots:
            n += TranscriptLake(root).publish_txn(txn_id)
        self.done(txn_id)
        return n

    def recover(self, roots: list[str]) -> dict:
        """Make every crash point consistent before new work:
        committed records roll forward; orphan staged manifests (txn
        never reached its commit point) roll back.  Returns
        ``{rolled_forward, rolled_back}`` counts."""
        from .lake import TranscriptLake

        fwd = 0
        committed: set[str] = set()
        for rec in self.pending():
            committed.add(rec["id"])
            fwd += self.publish(rec["id"], rec["roots"])
        back = 0
        for root in roots:
            lake = TranscriptLake(root)
            for staged in lake.staged_txn_manifests():
                tid = staged.rsplit(".txn-", 1)[1]
                if tid not in committed:
                    lake.store.delete(staged)
                    back += 1
        return {"rolled_forward": fwd, "rolled_back": back}
