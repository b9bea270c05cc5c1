"""DataFrame → DataFrame operators.

Reference-parity modules (``projection``, ``flatten``, ``aggregation``,
``envelope``) cover every operator in SURVEY.md §2; ``relational``
exercises the categories the reference lacks (joins, windows, set ops,
cube/rollup); ``dedup`` / ``similarity`` / ``text`` / ``multimodal`` are
the north-star extension operators for large-scale training-data
pipelines.
"""
