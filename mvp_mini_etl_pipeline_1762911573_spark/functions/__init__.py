QUERIES: dict = {}
ORACLES: dict = {}
