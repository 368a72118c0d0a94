"""Sources: batch file readers + structured-streaming ingestion."""
