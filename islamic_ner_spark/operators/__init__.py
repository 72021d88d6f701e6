"""Spark DataFrame operators: annotate, triples, linking, components, graph, queries."""
