"""Pure, deterministic scalar/array functions shared by the Ray pipeline and
the single-process oracle. Everything here is byte-identity-critical."""
