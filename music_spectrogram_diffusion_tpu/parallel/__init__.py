"""Device mesh construction and logical-axis sharding rules."""
