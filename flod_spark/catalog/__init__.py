"""Catalog: one module per operator family; importing a module registers its
qkeys into flod_spark.registry (driver correctness contract)."""
