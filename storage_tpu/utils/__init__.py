"""Calendar, day-count, discounting and basis-DSL utilities."""
