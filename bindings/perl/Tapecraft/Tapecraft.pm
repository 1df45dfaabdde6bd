package Tapecraft;
# Perl binding over the tapecraft stable C ABI (native/tapecraft.h) —
# the stringzilla-tpu host runtime: hashing, SHA-256, PRNG fill,
# tokenization, UTF-8 decode/encode, and collection argsort.
use strict;
use warnings;

our $VERSION = '0.01';

require XSLoader;
XSLoader::load('Tapecraft', $VERSION);

1;
__END__

=head1 NAME

Tapecraft - Perl consumer of the stringzilla-tpu host-runtime C ABI

=head1 SYNOPSIS

  use Tapecraft;
  my $h   = Tapecraft::hash("hello", 0);        # 64-bit seeded hash
  my $dig = Tapecraft::sha256("abc");           # 32-byte digest
  my @ord = Tapecraft::argsort(\@strings);      # stable lexicographic

=head1 DESCRIPTION

Thin XS wrapper over C<libtapecraft.so> (see C<native/tapecraft.h>), the
same stable seam the Rust and Go bindings consume.  Mirrors the
single-string surface of the reference's language bindings.

=cut
