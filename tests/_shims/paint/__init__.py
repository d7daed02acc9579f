# paint-csp shim for the torch reference oracle (tests only).
