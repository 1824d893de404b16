"""Host data pipeline: sources, preprocessors, tasks, feature converters."""
