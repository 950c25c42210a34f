"""Engine operators: CDC merge kernel, relational query surface,
streaming analytics, and large-scale data-pipeline operators."""
