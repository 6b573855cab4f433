"""Ray Data stages: callable batch transforms (stateless tasks) and callable
classes (actor pools) operating on zero-copy Arrow batches."""
