"""End-to-end pipeline compositions (the reference's entry points as
declarative DataFrame DAGs)."""
