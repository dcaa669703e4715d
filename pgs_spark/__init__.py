"""pgs_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities surveyed from micycle1/PGS (see SURVEY.md): derive an edge table
from raw records (graft of PGS_Conversion.toDualGraph, PGS_Conversion.java:1068-1108),
then run iterative graph algorithms — PageRank (power iteration, the
PGS_Meshing.smoothMesh convergence-loop template, PGS_Meshing.java:803-814),
connected components (the ConnectivityInspector role, PGS_Meshing.java:736),
label propagation (the stochasticMerge island pass, PGS_Meshing.java:706-725),
and triangle counting (the TriangleCollector role, PGS_Meshing.java:118-129) —
as DataFrame transformations with explicit partitioning, skew handling and
superstep checkpointing.

Everything is built on the public PySpark DataFrame/SQL API; no code is copied
from the reference (which is a single-JVM Java geometry library).
"""

__version__ = "0.1.0"
