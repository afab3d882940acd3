"""Offline dataset-creation (ETL) scripts — run once per corpus
(reference enmap_data/create_enmap_dataset.py and
create_enmap_dfc_dataset.py). Pure host-side raster work; no device code."""
