"""End-to-end pipeline plans and stage orchestration."""
