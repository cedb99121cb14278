"""Dataset pipelines: the minimum extract slice and the BSP crawl driver."""
