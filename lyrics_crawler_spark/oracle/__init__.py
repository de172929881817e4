from .reference_oracle import ReferenceOracle, OracleResult  # noqa: F401
