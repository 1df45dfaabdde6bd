#!/usr/bin/perl
# argsort through the pgram-key export + key-sort ABI pipeline,
# differentially against Perl's own sort.
use strict;
use warnings;
use Test::More tests => 3;

use Tapecraft;

my @words = qw(pear Apple apple banana fig apple grape kiwi banana a);
my @order = Tapecraft::argsort(\@words);
my @got = map { $words[$_] } @order;
my @want = sort @words;
is_deeply(\@got, \@want, 'argsort lexicographic');

# stability: equal strings keep input order
my @eq_pos = grep { $words[$order[$_]] eq 'apple' } 0 .. $#order;
my @eq_idx = map { $order[$_] } @eq_pos;
is_deeply(\@eq_idx, [ sort { $a <=> $b } @eq_idx ], 'argsort stable');

# long strings with shared prefixes exercise multi-word keys
my @long = map { ("x" x 40) . $_ } qw(zeta alpha midway beta);
my @lorder = Tapecraft::argsort(\@long);
is_deeply([ map { $long[$_] } @lorder ], [ sort @long ],
          'argsort long shared prefixes');
