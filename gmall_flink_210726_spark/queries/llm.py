"""LLM-data-pipeline queries (dedup / similarity / text analysis).

Filled in by wave 4 — see operators/dedup.py, operators/similarity.py,
operators/text.py.
"""
