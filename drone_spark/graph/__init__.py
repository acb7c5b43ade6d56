"""Graph data model: vertices/degrees derivation, vertex-cut partitioning,
CSR-as-Arrow partition encoding."""
