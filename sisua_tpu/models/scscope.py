"""scScope placeholder — parity with the reference's empty stub
(``/root/reference/sisua/models/scscope.py``: imports only, no
implementation). Reserved for the recurrent imputation autoencoder of
Deng et al. 2019; not implemented upstream either."""
