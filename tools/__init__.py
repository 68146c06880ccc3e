"""Dev tools (selfcheck, fixture gen, timing sweep). Package so tests
can import the driver-faithful comparator from tools.selfcheck."""
