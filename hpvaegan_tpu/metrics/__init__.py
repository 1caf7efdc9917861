from .fid import calculate_SIFID, calculate_SVFID, calculate_frechet_distance
