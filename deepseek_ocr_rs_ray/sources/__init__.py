"""Sources & sinks: validated readers and durable writers (S/K families)."""
