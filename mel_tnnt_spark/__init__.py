"""mel_tnnt_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the capabilities of KGCP/MEL-TNNT.

The reference (/root/reference, MIT) is a single-process Python pipeline:
MEL extracts per-file metadata + text analysis, TNNT runs multi-model NER,
results are summarised and pushed to CouchDB/Virtuoso. This package
re-expresses those *capabilities* as lazy DataFrame plans over columnar
tables:

    source(repo, path, commit, lang, content, content_sha)
      -> metadata stage   (derived cols + text-analysis struct)   MEL
      -> mention stage    (mapInPandas vectorized detectors)      TNNT
      -> canonicalisation (broadcast tnnt:* label join)
      -> linking          (broadcast alias dictionary + top-1)
      -> identity         (connected components, iterative joins)
      -> triples          (partitioned (subj, pred, obj) table)

Everything is built on public PySpark APIs only. No code is copied from
the reference; file:line citations in docstrings point at the behaviour
being re-implemented so parity can be checked.
"""

__version__ = "0.1.0"
