"""Command-line entry points (train, synthesize, evaluate, dump-task)."""
