"""Sources: testdata loaders + deterministic derived geo tables whose
Spark and DuckDB definitions are arithmetically identical (the oracle
contract)."""
