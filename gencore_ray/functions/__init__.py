"""Pure, deterministic scalar/vector functions shared by all stages."""
