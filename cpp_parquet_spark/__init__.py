"""cpp_parquet_spark — a PySpark-native per-column lightweight-compression engine.

From-scratch implementation (NOT a port) of the capabilities of the
reference `Apsalar/cpp-parquet` toy Parquet writer, per the north rule in
/root/repo/BASELINE.json: per-column codecs (PLAIN, dictionary,
RLE/bit-packed hybrid, bit-pack, frame-of-reference, FSST-style string
symbol tables) with sampling-based codec auto-selection, vectorized
pandas/Arrow UDF execution, salted partitioning, and a resumable
per-partition lineage/metrics manifest.

Format semantics for the Parquet-native subset follow the public Parquet
Thrift IDL (parquet.thrift, see SURVEY.md §0.2 [T]) and the Impala-derived
RLE/bit-packed hybrid grammar (arrow/util/rle_encoding.h:46-85, [RLE]).
"""

__version__ = "0.1.0"
