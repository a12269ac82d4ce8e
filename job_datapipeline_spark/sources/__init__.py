"""Sources & sinks: how data enters and leaves the engine.

- ``readers``: schema'd CSV glob scan with filename-derived columns (S5+S6),
  newest-partition incremental reads (S7), JSON side inputs (S8).
- ``sinks``: partitioned Parquet append (S10), CSV (S12), and a
  ``foreachPartition`` KV sink (S14).
- ``html``: the reference's HTML extraction surface (H1-H6) as Arrow-batched
  ``mapInPandas`` over a stored-payload column.
- ``multimodal``: opaque binary columns (images/audio/video) with typed
  metadata, content fingerprints, and stubbed decoders.
"""
