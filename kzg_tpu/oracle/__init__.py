"""Pure-Python oracle backend: the trivially-correct reference implementation
every TPU kernel is differentially tested against."""
