"""sisua-embed — GMM probabilistic embedding CLI
(reference ``bin/sisua-embed`` → ``label_threshold.main``)."""

from ..label_threshold import main

if __name__ == "__main__":
  main()
