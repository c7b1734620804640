"""Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
CityOfPhiladelphia/databridge-etl-tools (reference at /root/reference)
on Ray Data: a WAL/binlog-style change log of (op, lsn, conv_id,
turn_idx, role, text, tool, ts) events is replayed into a partitioned
Parquet lake of multi-turn transcripts with last-writer-wins merge,
schema evolution, exactly-once manifests and per-partition lineage.

Reference semantics mapped (see SURVEY.md for the full inventory):
- upsert  = ``INSERT .. ON CONFLICT DO UPDATE`` last-writer-wins
  (reference: databridge_etl_tools/postgres/postgres.py:497-573)
- delete  = ``DELETE USING EXCEPT`` anti-join
  (reference: postgres/postgres.py:450-495)
- load    = atomic truncate-and-swap
  (reference: carto/carto_.py:422-436, oracle/oracle.py:286-406)
- watermark/resume = Oracle SCN history table
  (reference: db2/db2.py:596-655)

No module in this package calls ``ray.init()`` — the driver owns the
Ray session.
"""

__version__ = "0.1.0"
