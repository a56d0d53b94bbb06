"""deepie_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
DeepIE reference (loujie0822/DeepIE).

Pipeline (staged DataFrame passes, each checkpointable):

    pages -> texts -> tokens -> mentions -> subjects -> po -> raw_triples
          -> triples -> linked -> canonical -> kg (MERGE)

Everything is DataFrame/Catalyst-first; Python appears only inside
Arrow-batched pandas UDFs (never per-row Python), per the build contract.
"""

__version__ = "0.1.0"
