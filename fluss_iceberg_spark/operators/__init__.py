"""Engine operators: reference-parity relational ops + training-data extensions."""
