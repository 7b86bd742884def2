"""ray-extract: a Ray-Data-native document extraction engine.

From-scratch rebuild of the data-processing capabilities of
climatepolicyradar/azure-pdf-parser (reference at /root/reference, studied for
semantics only): local layout parsing of interleaved text+media documents as
``ray.data.Dataset`` pipelines — map_batches over zero-copy Arrow, an actor
pool for the warm layout parser, one ``groupby(doc_id)`` shuffle to reassemble
split page ranges — emitting ParserOutput-equivalent ordered span sequences.

See SURVEY.md for the full blueprint and reference citations.
"""

__version__ = "0.1.0"
